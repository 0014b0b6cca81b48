"""Sequence packing (operators/packing.py) and corpus paragraph dedup
(operators/dedup.py::paragraph_dedup) unit tests — invariants the DuckDB
contract oracle can't see from the outside: pack fills never exceed
capacity, offsets are contiguous, Arrow batch boundaries don't reset
packing state, and paragraph survivors are exactly first occurrences."""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.operators.dedup import paragraph_dedup
from datavalidation_spark.operators.packing import (
    default_buckets,
    pack_sequences,
    pack_stats,
)

CAP = 50


def _docs(spark, n=200):
    # token counts 5..104: some docs exceed CAP=50 (truncation branch),
    # most co-pack
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 100 + 5).cast("int")),
                lambda i: F.concat(F.lit("w"), i.cast("string")),
            ),
            " ",
        ).alias("text"),
    )


def test_pack_invariants(spark):
    docs = _docs(spark)
    packed = pack_sequences(docs, capacity=CAP, n_buckets=4).cache()
    rows = packed.orderBy("bucket", "pack_id", "pack_offset").collect()
    assert len(rows) == 200
    # replay: per (bucket, pack) offsets contiguous, fill <= capacity
    fill: dict[tuple, int] = {}
    for r in rows:
        key = (r.bucket, r.pack_id)
        assert r.eff_tokens <= CAP
        if r.truncated:  # over-long doc: truncated to one full pack, alone
            assert r.eff_tokens == CAP and r.pack_offset == 0
        assert r.pack_offset == fill.get(key, 0), r
        fill[key] = r.pack_offset + r.eff_tokens
        assert fill[key] <= CAP
    st = pack_stats(packed, CAP).collect()
    assert all(s.fill_ratio <= 1.0 for s in st)
    assert sum(s.n_docs for s in st) == 200
    # truncated docs occupy a pack alone at exactly capacity
    for s in st:
        if s.any_truncated:
            assert s.n_docs == 1 and s.used_tokens == CAP
    packed.unpersist()


def test_pack_batch_boundary_state(spark):
    """One bucket split across many tiny Arrow batches must pack exactly
    like one big batch (state carried across the mapInPandas iterator)."""
    docs = _docs(spark, 150)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        tiny = pack_sequences(docs, capacity=CAP, n_buckets=1).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    big = pack_sequences(docs, capacity=CAP, n_buckets=1).collect()
    key = lambda r: r.doc_id
    assert sorted(map(tuple, tiny), key=lambda t: t[0]) == sorted(
        map(tuple, big), key=lambda t: t[0]
    )


def test_default_buckets_scales():
    assert default_buckets(100) == 1
    assert default_buckets(4097) == 2
    assert default_buckets(10**12) == 244140625  # docs/bucket stays ~4096


def test_paragraph_dedup_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta\nalpha"),  # beta+alpha lose to doc 1
            (3, "gamma\nbeta"),  # everything lost
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].n_kept == 3 and out[1].cleaned_text == "alpha\nbeta\ngamma"
    assert out[2].n_kept == 1 and out[2].cleaned_text == "delta"
    assert out[3].n_kept == 0 and out[3].cleaned_text == ""
    assert out[3].n_lines == 2


def test_paragraph_dedup_idempotent(spark):
    """Dedup of a deduped corpus removes nothing further."""
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "b\nc\nc")], "doc_id long, text string"
    )
    once = paragraph_dedup(docs).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    twice = {r.doc_id: r for r in paragraph_dedup(once).collect()}
    assert twice[1].n_kept == twice[1].n_lines == 2  # "a\nb" survives whole
    assert twice[2].cleaned_text == "c" and twice[2].n_kept == 1


def test_shard_packs_positions_and_determinism(spark):
    from datavalidation_spark.operators.packing import shard_packs

    docs = _docs(spark)
    packed = pack_sequences(docs, capacity=CAP, n_buckets=4).localCheckpoint()
    a = shard_packs(packed, capacity=CAP, n_shards=3).collect()
    b = shard_packs(packed, capacity=CAP, n_shards=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    # positions within each shard are 1..n with no gaps
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    assert set(by_shard) <= {0, 1, 2}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # every pack appears exactly once
    assert len(a) == packed.select("bucket", "pack_id").distinct().count()


def test_pack_property_matches_pure_python_replay(spark):
    """Hypothesis: for random token counts and capacities, the distributed
    packer matches a serial pure-Python replay of the packing rule."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
        capacity=st.integers(min_value=1, max_value=25),
    )
    def run(toks, capacity):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens int"
        )
        got = {
            r.doc_id: (r.bucket, r.pack_id, r.pack_offset, r.eff_tokens, r.truncated)
            for r in pack_sequences(
                docs, capacity=capacity, n_buckets=2, n_tokens=F.col("n_tokens")
            ).collect()
        }
        # serial replay: same hash bucket, same doc_id order, same rule
        import hashlib

        def bucket_of(i):
            h = hashlib.md5(f"pack|{i}".encode()).hexdigest()
            return int(h[:8], 16) % 2

        state = {}
        for i, t in enumerate(toks):  # doc_id order == enumerate order
            b = bucket_of(i)
            pack_id, fill = state.get(b, (-1, capacity + 1))
            eff = min(t, capacity)
            if fill + eff > capacity:
                pack_id, fill = pack_id + 1, 0
            assert got[i] == (b, pack_id, fill, eff, t > capacity), (
                i, t, capacity, got[i], (b, pack_id, fill, eff),
            )
            state[b] = (pack_id, fill + eff)

    run()


def test_write_training_shards_layout_and_order(spark, tmp_path):
    """The written artifact is partitioned by shard and each shard file's
    physical row order is (pos_in_shard, pack_offset) — a training reader
    streams it sequentially with no sort."""
    import glob

    import pyarrow.parquet as pq

    from datavalidation_spark.operators.packing import (
        shard_packs,
        write_training_shards,
    )

    docs = _docs(spark, 120).localCheckpoint()
    packed = pack_sequences(docs, capacity=CAP, n_buckets=4).localCheckpoint()
    shards = shard_packs(packed, capacity=CAP, n_shards=3).localCheckpoint()
    out = write_training_shards(docs, packed, shards, str(tmp_path / "shards"))

    shard_dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(shard_dirs) == shards.select("shard").distinct().count()
    seen = 0
    for d in shard_dirs:
        tbl = pq.read_table(d)  # preserves physical row order
        pdf = tbl.to_pandas()
        seen += len(pdf)
        key = list(zip(pdf["pos_in_shard"], pdf["pack_offset"]))
        assert key == sorted(key), f"unsorted rows in {d}"
        assert pdf["text"].notna().all()
    assert seen == 120  # every doc written exactly once


def test_pack_plan_shuffles_ints_only(spark, sf001):
    """Scale contract: the packing exchange must carry only
    (doc_id, n_tokens, bucket) ints — document text must be projected away
    BEFORE the repartition, never ride the shuffle."""
    docs = sf001["documents"]
    plan = (
        pack_sequences(docs, capacity=64, n_buckets=8)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    lines = plan.splitlines()
    # the pandas stage consumes only the three int columns
    assert "_pack_partition(doc_id" in lines[0] and "text#" not in lines[0]
    # the Exchange's child is the Project that computes n_tokens/bucket and
    # drops text — so the shuffle carries (doc_id, n_tokens, bucket) only
    (ex_i,) = [i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l]
    child = lines[ex_i + 1]
    assert child.lstrip(" +-").startswith("Project [doc_id#"), child
    assert "AS n_tokens" in child and "AS bucket" in child
