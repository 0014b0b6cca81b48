"""URL / domain operators — host extraction, registered-domain heuristic,
and deterministic per-domain document caps.

Web-scale corpora are curated at DOMAIN granularity (CCNet / RefinedWeb /
Dolma all cap or weight by registered domain: one hot domain must not
dominate the training mix, and domain-level dedup/blocklists precede
content-level passes). These are the Spark-side primitives for that tier.

Engine-portability constraints (the same expressions must replay in a SQL
oracle): only ``regexp_extract``-style GROUP EXTRACTION is used — never
replacement backreferences, whose syntax differs between Java regex
(``$1``) and RE2-family engines (``\\1``) — and patterns avoid lookaround
and backrefs so Java and RE2 agree on every match.

Scale shape: host/domain extraction is a pure codegen projection riding the
existing scan; ``domain_cap`` is ONE rank shuffle keyed by domain (same
md5-rank determinism as ``operators/sampling.py`` — identical survivors on
any partitioning, cluster size, or engine), with the hot-domain prefilter
trick available upstream via ``sample_stratified(prefilter=True)`` when a
domain holds a large corpus share.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import hash_rank

# scheme://host[:port]/... → host (group 1); no backrefs, Java∩RE2-safe
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
# last two dot-labels of a host ("registered domain" heuristic)
_REG2_RE = r"([^.]+\.[^.]+)$"
# last THREE labels — applied when the 2-label suffix is a known
# second-level public suffix (co.uk, com.au, ...)
_REG3_RE = r"([^.]+\.[^.]+\.[^.]+)$"

# minimal public-suffix-lite set: 2-label suffixes under which the
# registrable name needs three labels. A full public-suffix list is a data
# file a production deployment would broadcast; the operator's shape
# (suffix-conditional label count) is what matters here.
SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.sg", "com.tr",
)


def url_host(url: Column) -> Column:
    """Lowercased host of a URL; NULL when no scheme://host prefix parses.

    ``nullif`` instead of ``when(x != '', x)`` here and below (r6): the
    conditional forms referenced each regexp_extract twice, and the fused
    domain_cap projection tripped a janino InternalCompilerException on
    the generated ``matchResult.group(1)`` accesses — the whole stage then
    ran INTERPRETED. The nullif forms are value-identical (empty → NULL,
    NULL → NULL) and compile."""
    return F.lower(F.nullif(F.regexp_extract(url, _HOST_RE, 1), F.lit("")))


def strip_www(host: Column) -> Column:
    """Drop one leading ``www.`` label (group extraction, not replacement)."""
    return F.coalesce(
        F.nullif(F.regexp_extract(host, r"^www\.(.+)$", 1), F.lit("")), host
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain: last two labels, or last three when the 2-label
    tail is a known second-level public suffix (``example.co.uk`` →
    ``example.co.uk``, not ``co.uk``). NULL-safe; a host with fewer labels
    passes through unchanged."""
    two = F.nullif(F.regexp_extract(host, _REG2_RE, 1), F.lit(""))
    three = F.nullif(F.regexp_extract(host, _REG3_RE, 1), F.lit(""))
    return F.coalesce(
        F.when(two.isin(*SECOND_LEVEL_SUFFIXES), three), two, host
    )


def domain_cap(
    df: DataFrame,
    url_col: str,
    n_per_domain: int,
    key_col: str = "doc_id",
    salt: str = "",
    out_domain: str = "domain",
    out_rank: str = "domain_rank",
) -> DataFrame:
    """Keep at most ``n_per_domain`` documents per registered domain — the
    deterministic md5-rank winners, ties broken by key — adding the domain
    and the 1-based rank. Documents whose URL has no parseable host are
    KEPT unconditionally under a NULL domain (dropping them is a content
    decision, not a capping one; filter ``out_domain IS NULL`` upstream if
    unparseable URLs should go).

    One shuffle keyed by domain — and ONLY over rows that have one:
    NULL-domain rows are exempt from capping, so routing them through the
    window would funnel every unparseable URL in the corpus onto a single
    NULL-key reducer (a skew bomb at web scale, where malformed URLs are
    a fat slice); instead they bypass the exchange entirely with a NULL
    rank. Skew note for real domains: a single dominant domain makes its
    key hot; this is the same shape as ``sample_stratified`` and the same
    hash-threshold prefilter applies upstream when needed.
    """
    for col in (out_domain, out_rank):
        if col in df.columns:
            raise ValueError(
                f"input already has a {col!r} column — pass a different "
                "output name (withColumn would silently clobber it)"
            )
    dom = registered_domain(strip_www(url_host(F.col(url_col))))
    with_dom = df.withColumn(out_domain, dom)
    # Split on regexp_like of the RAW url, not on the derived domain (r6):
    # ``domain IS NULL`` exactly ⟺ the host regex does not match (every
    # later step only coalesces back toward the host), but a filter on the
    # derived column gets pushed below the projection with the whole
    # 3-regex extraction chain duplicated into it — which both doubles the
    # regex work and trips a janino InternalCompilerException on the
    # generated matchResult accesses, dropping the ENTIRE stage out of
    # whole-stage codegen (observed: interpreted fallback on every
    # domain_cap run). The boolean regexp_like probe pushes down clean.
    is_parseable = F.coalesce(
        F.regexp_like(F.col(url_col), F.lit(_HOST_RE)), F.lit(False)
    )
    parseable = with_dom.where(is_parseable)
    unparseable = with_dom.where(~is_parseable).withColumn(
        out_rank, F.lit(None).cast("int")
    )
    w = Window.partitionBy(out_domain).orderBy(
        hash_rank(F.col(key_col), salt), F.col(key_col)
    )
    capped = (
        parseable.withColumn(out_rank, F.row_number().over(w))
        .where(F.col(out_rank) <= n_per_domain)
    )
    return capped.unionByName(unparseable)
