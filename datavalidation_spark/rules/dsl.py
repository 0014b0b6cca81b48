"""JSON-serializable rule catalog: specs → compiled vectorized plan.

The reference hard-codes every rule as an imperative Python function
(``validators/me_consumption_validation.py:92-155`` and 7 siblings), so
changing a threshold means shipping code. Here a catalog is *data*: a list
of JSON-safe dicts whose predicates/remarks are ANSI-SQL expression strings,
compiled via ``F.expr`` into the same :class:`~..rules.core.Rule` objects the
hand-written catalogs use — one whole-stage-codegen projection, no per-row
Python, identical null semantics (every predicate is ``nv``-wrapped by
``Rule.fire_col``).

Why this matters at 10^12 docs: the north-star audit table records a
``rule_version`` per validated partition so resumes skip work ONLY when the
rules haven't changed (``engine/audit.py:73-83``). With hand-built Column
catalogs that version is a hand-maintained string; with a serialized catalog
it is *content-addressed*: :func:`catalog_version` hashes the canonical JSON,
so editing any threshold automatically invalidates exactly the affected
(rule_version, snapshot) audit rows and a resumed run re-validates everything
— no stale-verdict footgun.

Spec schema (one rule)::

    {
      "rule_id":        "DOC-NCHARS-RANGE",        # required, unique
      "violation":      "n_chars < 1 OR n_chars > 1e6",   # required, SQL bool
      "remark":         "concat('bad n_chars: ', n_chars)",  # SQL expr …
      "remark_literal": "n_chars out of range",    # … or a plain string
      "where":          "lang = 'en'",             # optional applicability
      "severity":       "error",                   # optional; error|warn|info
      "tags":           ["doc", "range"]           # optional
    }

Exactly one of ``remark`` / ``remark_literal`` must be present. Expression
strings are parsed by Spark's SQL parser at compile time (``F.expr``), so a
syntax error fails fast at catalog load, not mid-job.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Sequence

from pyspark.sql import functions as F

from .core import Rule, RuleSet

_REQUIRED = {"rule_id", "violation"}
_ALLOWED = _REQUIRED | {"remark", "remark_literal", "where", "severity", "tags"}
# severity is load-bearing downstream (quarantine() gates on the exact
# string), so a typo like "warning"/"ERROR" must fail at load, not silently
# never gate
_SEVERITIES = {"error", "warn", "info"}


def validate_spec(spec: dict) -> None:
    """Structural validation (session-free): required/unknown keys, remark
    exclusivity, types. Expression syntax is checked later by the SQL parser
    in :func:`compile_rule`."""
    if not isinstance(spec, dict):
        raise TypeError(f"rule spec must be a dict, got {type(spec).__name__}")
    missing = _REQUIRED - spec.keys()
    if missing:
        raise ValueError(f"rule spec missing {sorted(missing)}: {spec!r}")
    unknown = spec.keys() - _ALLOWED
    if unknown:
        raise ValueError(
            f"rule spec {spec['rule_id']!r} has unknown keys {sorted(unknown)}"
        )
    if ("remark" in spec) == ("remark_literal" in spec):
        raise ValueError(
            f"rule spec {spec['rule_id']!r} needs exactly one of "
            "'remark' (SQL expr) or 'remark_literal' (constant string)"
        )
    for k in ("rule_id", "violation", "remark", "remark_literal", "where", "severity"):
        if k in spec and not isinstance(spec[k], str):
            raise TypeError(f"rule spec field {k!r} must be a string")
    if "severity" in spec and spec["severity"] not in _SEVERITIES:
        raise ValueError(
            f"rule spec {spec['rule_id']!r} severity {spec['severity']!r} "
            f"not in {sorted(_SEVERITIES)}"
        )
    if "tags" in spec and not (
        isinstance(spec["tags"], (list, tuple))
        and all(isinstance(t, str) for t in spec["tags"])
    ):
        raise TypeError("rule spec field 'tags' must be a list of strings")


def _parse_check(rule_id: str, field: str, sql_expr: str) -> None:
    """Fail-fast syntax check. Spark 4's Column API is lazy — ``F.expr``
    defers parsing to plan resolution, which would surface a catalog typo
    mid-job instead of at load. When a classic (JVM) session is active, run
    the session's SQL parser on the expression now; under Connect (no local
    parser) the check degrades to lazy."""
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession()
    parser = None
    try:
        parser = session._jsparkSession.sessionState().sqlParser()
    except Exception:
        return  # Connect / no active session: parsing stays lazy
    try:
        parser.parseExpression(sql_expr)
    except Exception as exc:
        raise ValueError(
            f"rule {rule_id!r} field {field!r} is not valid SQL: "
            f"{sql_expr!r} ({exc.__class__.__name__})"
        ) from exc


def compile_rule(spec: dict) -> Rule:
    """One spec → one :class:`Rule`. With an active classic SparkSession the
    expression strings are parse-checked eagerly so bad SQL fails at load."""
    validate_spec(spec)
    for fld in ("violation", "remark", "where"):
        if fld in spec:
            _parse_check(spec["rule_id"], fld, spec[fld])
    remark = (
        F.expr(spec["remark"]).cast("string")
        if "remark" in spec
        else spec["remark_literal"]
    )
    return Rule(
        rule_id=spec["rule_id"],
        violation=F.expr(spec["violation"]),
        remark=remark,
        where=F.expr(spec["where"]) if "where" in spec else None,
        severity=spec.get("severity", "error"),
        tags=tuple(spec.get("tags", ())),
    )


def load_catalog(specs: Sequence[dict] | str, name: str = "dsl") -> RuleSet:
    """A JSON string or list of spec dicts → compiled :class:`RuleSet`.

    Rule ids must be unique; rule ORDER is preserved (it is the order of the
    violation structs in the annotated array, hence user-visible)."""
    if isinstance(specs, str):
        specs = json.loads(specs)
    if not isinstance(specs, Sequence) or isinstance(specs, (str, bytes)):
        raise TypeError("catalog must be a list of rule specs")
    rules = [compile_rule(s) for s in specs]
    ids = [r.rule_id for r in rules]
    if len(set(ids)) != len(ids):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate rule_id(s) in catalog: {dupes}")
    return RuleSet(name=name, rules=tuple(rules))


def catalog_version(specs: Sequence[dict] | str) -> str:
    """Content-addressed catalog version: sha256 over canonical JSON
    (sorted keys within each spec, catalog order preserved — reordering
    rules changes the output array and therefore the version), first 16 hex
    chars. Feed this to ``run_resumable(rule_version=...)`` so any catalog
    edit invalidates previously-validated partitions."""
    if isinstance(specs, str):
        specs = json.loads(specs)
    canonical = json.dumps(list(specs), sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()[:16]
