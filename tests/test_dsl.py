"""Serialized rule catalog (rules/dsl.py): spec validation, content-addressed
versioning, and plan parity with the hand-built Column catalogs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.rules.core import Rule, nv, violations
from datavalidation_spark.rules.dsl import (
    catalog_version,
    compile_rule,
    load_catalog,
    validate_spec,
)

CATALOG = [
    {
        "rule_id": "T-MISS",
        "violation": "text IS NULL OR length(text) = 0",
        "remark_literal": "text missing",
    },
    {
        "rule_id": "T-SHORT",
        "where": "lang = 'en'",
        "violation": "n_chars < 400",
        "remark": "concat('len=', cast(n_chars as string))",
        "severity": "warn",
        "tags": ["len"],
    },
]


# ---------------------------------------------------------------------------
# session-free: structural validation + versioning
# ---------------------------------------------------------------------------


def test_validate_spec_rejects_bad_shapes():
    with pytest.raises(ValueError, match="missing"):
        validate_spec({"rule_id": "X"})
    with pytest.raises(ValueError, match="unknown keys"):
        validate_spec(
            {"rule_id": "X", "violation": "1=1", "remark_literal": "r", "oops": 1}
        )
    with pytest.raises(ValueError, match="exactly one of"):
        validate_spec({"rule_id": "X", "violation": "1=1"})
    with pytest.raises(ValueError, match="exactly one of"):
        validate_spec(
            {"rule_id": "X", "violation": "1=1", "remark": "'a'", "remark_literal": "a"}
        )
    with pytest.raises(TypeError, match="tags"):
        validate_spec(
            {"rule_id": "X", "violation": "1=1", "remark_literal": "r", "tags": "doc"}
        )


def test_duplicate_rule_ids_rejected(spark):
    specs = [dict(CATALOG[0]), dict(CATALOG[0])]
    with pytest.raises(ValueError, match="duplicate rule_id"):
        load_catalog(specs)


def test_catalog_version_content_addressed():
    v = catalog_version(CATALOG)
    assert len(v) == 16 and int(v, 16) >= 0
    # key order inside a spec does NOT change the version (canonical JSON)
    shuffled = [dict(reversed(list(s.items()))) for s in CATALOG]
    assert catalog_version(shuffled) == v
    # rule ORDER does (it is user-visible in the violations array)
    assert catalog_version(list(reversed(CATALOG))) != v
    # any threshold edit does
    edited = [dict(s) for s in CATALOG]
    edited[1]["violation"] = "n_chars < 500"
    assert catalog_version(edited) != v
    # json-string input is equivalent to the list form
    import json

    assert catalog_version(json.dumps(CATALOG)) == v


# ---------------------------------------------------------------------------
# compiled semantics
# ---------------------------------------------------------------------------


def test_bad_sql_fails_at_compile(spark):
    with pytest.raises(ValueError, match="not valid SQL"):
        compile_rule(
            {"rule_id": "X", "violation": "n_chars ===! 1", "remark_literal": "r"}
        )


def test_dsl_matches_handbuilt_catalog(spark):
    df = spark.createDataFrame(
        [
            ("a", "hello world", 11, "en"),
            ("b", "", 0, "en"),            # T-MISS fires
            ("c", None, None, "en"),       # T-MISS fires; T-SHORT null-voided
            ("d", "x", 1, "en"),           # T-SHORT fires (len=1)
            ("e", "x", 1, "fr"),           # where-gated out
            ("f", "x", 1, None),           # NULL lang → where null-voided
            ("g", "long enough", 400, "en"),
        ],
        "doc_id string, text string, n_chars int, lang string",
    )
    hand = [
        Rule(
            rule_id="T-MISS",
            violation=F.col("text").isNull() | (F.length("text") == 0),
            remark="text missing",
        ),
        Rule(
            rule_id="T-SHORT",
            violation=F.col("n_chars") < 400,
            remark=F.concat(F.lit("len="), F.col("n_chars").cast("string")),
            where=F.col("lang") == "en",
            severity="warn",
        ),
    ]
    got_dsl = sorted(
        tuple(r) for r in violations(df, load_catalog(CATALOG).rules, ["doc_id"]).collect()
    )
    got_hand = sorted(tuple(r) for r in violations(df, hand, ["doc_id"]).collect())
    assert got_dsl == got_hand
    fired = {(r[0], r[1]) for r in got_dsl}
    assert fired == {
        ("a", "T-SHORT"),  # 11 < 400, en
        ("b", "T-MISS"),
        ("b", "T-SHORT"),  # 0 < 400, en — both rules fire on one row
        ("c", "T-MISS"),
        ("d", "T-SHORT"),
    }
    # severity survives the spec round-trip
    sev = {r[1]: r[2] for r in got_dsl}
    assert sev == {"T-MISS": "error", "T-SHORT": "warn"}


def test_dsl_null_semantics_match_nv(spark):
    """A NULL violation predicate must mean NOT a violation (core.nv), even
    when the spec author writes a negation-sensitive expression."""
    df = spark.createDataFrame(
        [("a", None)], "doc_id string, n_chars int"
    )
    cat = load_catalog(
        [
            {
                "rule_id": "NEG",
                "violation": "NOT (n_chars >= 0)",
                "remark_literal": "neg",
            }
        ]
    )
    assert violations(df, cat.rules, ["doc_id"]).count() == 0


def test_catalog_version_drives_audit_resume(spark, tmp_path):
    """Editing the catalog changes rule_version, which invalidates the
    audit log's validated-partition memo — the resume-correctness contract
    (engine/audit.py:73-83)."""
    from datavalidation_spark.engine.audit import run_resumable

    docs = (
        spark.range(40)
        .select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            (F.col("id") % 4).cast("int").alias("part_id"),
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.lit("hello").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )
    )
    v1 = catalog_version(CATALOG)
    edited = [dict(s) for s in CATALOG]
    edited[1]["violation"] = "n_chars < 500"
    v2 = catalog_version(edited)
    audit_dir = str(tmp_path / "audit")
    n1 = run_resumable(spark, docs, audit_dir, run_id="r1", rule_version=v1)
    assert n1 == 4
    # same catalog → nothing to redo; edited catalog → full re-validation
    assert run_resumable(spark, docs, audit_dir, run_id="r2", rule_version=v1) == 0
    assert run_resumable(spark, docs, audit_dir, run_id="r3", rule_version=v2) == 4


def test_run_cli_rules_flag_content_addresses_rule_version(spark, tmp_path):
    """engine/run.py --rules: a JSON catalog runs on top of the span rules
    and its content hash becomes the audit rule_version, so an edited
    catalog re-validates while a resubmit of the same catalog is a no-op.
    (In-process main(); the spark-submit packaging path is covered by
    test_spark_submit.py.)"""
    import json

    from datavalidation_spark.engine import run as run_mod

    rules_f = tmp_path / "catalog.json"
    rules_f.write_text(
        json.dumps(
            [
                {
                    "rule_id": "CLI-SPANS-EMPTY",
                    "violation": "size(spans) = 0",
                    "remark_literal": "document has no spans",
                }
            ]
        )
    )
    audit = str(tmp_path / "audit")
    args = [
        "--synth-docs", "2000",
        "--audit", audit,
        "--rules", str(rules_f),
    ]
    assert run_mod.main(args + ["--run-id", "r1"]) == 0
    # same catalog → same content-addressed version → nothing to redo
    out2 = run_mod.main(args + ["--run-id", "r2"])
    assert out2 == 0
    from datavalidation_spark.engine.audit import AuditLog

    verd = AuditLog(audit)._read_verdicts(spark)
    versions = {r["rule_version"] for r in verd.select("rule_version").collect()}
    assert len(versions) == 1 and next(iter(versions)).startswith("v1+")
    n_first = verd.count()
    # edited catalog → new version → full re-validation appends new rows
    rules_f.write_text(
        json.dumps(
            [
                {
                    "rule_id": "CLI-SPANS-EMPTY",
                    "violation": "size(spans) < 1",
                    "remark_literal": "document has no spans",
                }
            ]
        )
    )
    assert run_mod.main(args + ["--run-id", "r3"]) == 0
    verd2 = AuditLog(audit)._read_verdicts(spark)
    assert verd2.select("rule_version").distinct().count() == 2
    assert verd2.count() == 2 * n_first


def test_dsl_rules_compile_onto_streams(spark, tmp_path):
    """The serialized catalog compiles onto a readStream source unchanged —
    the declarative layer's batch/stream parity claim holds for DSL rules:
    an availableNow file stream emits exactly the batch violation set."""
    from datavalidation_spark.datagen import synth_documents
    from datavalidation_spark.rules.core import violations
    from datavalidation_spark.rules.dsl import load_catalog
    from datavalidation_spark.streaming.validate_stream import stream_violations

    specs = [
        {
            "rule_id": "S-SPANS-EMPTY",
            "violation": "size(spans) = 0",
            "remark_literal": "no spans",
        },
        {
            "rule_id": "S-MANY-SPANS",
            "violation": "size(spans) > 4",
            "remark_literal": "suspiciously many spans",
            "severity": "warn",
        },
    ]
    rules = list(load_catalog(specs).rules)
    docs = synth_documents(spark, 1500, dirty=True)
    in_dir = str(tmp_path / "in")
    docs.write.parquet(in_dir)
    stored = spark.read.parquet(in_dir)

    stream = spark.readStream.schema(stored.schema).parquet(in_dir)
    out_dir = str(tmp_path / "out")
    q = (
        stream_violations(stream, rules=rules)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        # returns False on timeout (no raise) — assert so a hung/failed
        # stream reports itself instead of an opaque missing-path error
        assert q.awaitTermination(120), f"stream timed out; exc={q.exception()}"
    finally:
        q.stop()

    got = {
        (r.doc_id, r.rule_id)
        for r in spark.read.parquet(out_dir).select("doc_id", "rule_id").collect()
    }
    want = {
        (r.doc_id, r.rule_id)
        for r in violations(stored, rules, ["doc_id"]).collect()
    }
    assert got == want and len(want) > 0


def test_quarantine_split_semantics(spark):
    """quarantine(): error-severity rules gate, warn rules ride along; the
    quarantined frame carries its gating reasons in catalog order; the two
    frames partition the input."""
    from datavalidation_spark.rules.core import quarantine
    from datavalidation_spark.rules.dsl import load_catalog

    df = spark.createDataFrame(
        [
            ("a", "ok text", 400),   # clean
            ("b", "", 0),            # error fires -> quarantined
            ("c", "warn only", 10),  # warn fires -> stays clean
            ("d", None, 999),        # both errors fire -> both reasons
        ],
        "doc_id string, text string, n_chars int",
    )
    cat = load_catalog(
        [
            {
                "rule_id": "E-MISS",
                "violation": "text IS NULL OR length(text) = 0",
                "remark_literal": "missing",
            },
            {
                "rule_id": "E-BIG",
                "violation": "n_chars > 500",
                "remark_literal": "too big",
            },
            {
                "rule_id": "W-SHORT",
                "violation": "n_chars < 100",
                "remark_literal": "short",
                "severity": "warn",
            },
        ]
    )
    clean, bad = quarantine(df, cat.rules)
    assert {r["doc_id"] for r in clean.select("doc_id").collect()} == {"a", "c"}
    reasons = {
        r["doc_id"]: [v["rule_id"] for v in r["quarantine_reasons"]]
        for r in bad.collect()
    }
    assert reasons == {"b": ["E-MISS"], "d": ["E-MISS", "E-BIG"]}
    # the annotation column is gone from the clean side
    assert "quarantine_reasons" not in clean.columns
    # quarantine_on widening: warns gate too when asked
    clean2, bad2 = quarantine(df, cat.rules, quarantine_on=("error", "warn"))
    assert {r["doc_id"] for r in clean2.select("doc_id").collect()} == {"a"}


def test_quarantine_guards(spark):
    from datavalidation_spark.rules.core import quarantine
    from datavalidation_spark.rules.dsl import load_catalog, validate_spec

    df = spark.createDataFrame([("a", 1)], "doc_id string, n_chars int")
    cat = load_catalog(
        [{"rule_id": "R", "violation": "n_chars < 0", "remark_literal": "r"}]
    )
    # a bare severity string would iterate as characters and gate nothing
    with pytest.raises(TypeError, match="not a str"):
        quarantine(df, cat.rules, quarantine_on="error")
    # reserved / colliding output columns are rejected, not clobbered
    with pytest.raises(ValueError, match="reserved"):
        quarantine(df, cat.rules, out="__quarantine_ann")
    ann = df.withColumn("quarantine_reasons", F.lit("x"))
    with pytest.raises(ValueError, match="already has"):
        quarantine(ann, cat.rules)
    # severity typos fail at spec validation, not silently at gate time
    with pytest.raises(ValueError, match="severity"):
        validate_spec(
            {"rule_id": "X", "violation": "1=1", "remark_literal": "r",
             "severity": "warning"}
        )
