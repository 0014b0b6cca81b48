"""Text-analysis operators over a document corpus — language-ID, quality
scoring, token counting, fingerprinting. All pure Column expressions
(JVM-side, whole-stage codegen); these run inside the validation pass as
derived columns, so a 100 TB corpus pays zero extra scans.

Reference analog: the scalar rule library (SURVEY.md §2.6) — these are the
"domain functions" of a training-data pipeline the way haversine/slip/load
were the reference's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "en", "est", "que"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein", "zu"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "人"),
}

STOPWORDS_EN = LANG_PROFILES["en"] + ("this", "that", "for", "on", "with", "as")

# BPE-ish tokenizer: word pieces = runs of letters, digits, or single
# punctuation — the standard pre-tokenization regex shape
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (lowercased); empty array for null/empty text."""
    t = F.split(F.trim(F.lower(text)), r"\s+")
    return F.when(F.length(F.trim(text)) > 0, t).otherwise(F.array().cast("array<string>"))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenization regex (regexp_count —
    no array materialization, stays in codegen)."""
    return F.coalesce(F.regexp_count(text, F.lit(TOKEN_REGEX)), F.lit(0))


def lang_scores(text: Column) -> Column:
    """map<lang, matched-stopword-count> from the per-language profiles."""
    toks = tokens(text)
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(
                F.filter(toks, lambda t: t.isin(*words))
            ).alias("hits"),
        )
        for lang, words in LANG_PROFILES.items()
    ]
    return F.array(*entries)


def detect_lang(text: Column, default: str = "und") -> Column:
    """argmax over the stopword profiles; 'und' when nothing matches.
    Deterministic tie-break: max hits, then lexicographically largest lang
    (struct ordering compares fields in sequence)."""
    scores = lang_scores(text)
    best = F.array_max(
        F.transform(
            scores,
            lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang")),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit(default))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / word-length features — the standard
    heuristic quality signals of a pretraining filter."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.coalesce(F.length(text), F.lit(0))
    n_punct = F.coalesce(F.regexp_count(text, F.lit(r"[^\w\s]")), F.lit(0))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    mean_wlen = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0),
        "mean_word_len": mean_wlen,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] score: long-enough, low punctuation, some stopwords,
    plausible word lengths — a deterministic C4-style heuristic."""
    f = quality_features(text)
    len_ok = F.least(f["n_tokens"].cast("double") / 20.0, F.lit(1.0))
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 5.0)
    wlen = f["mean_word_len"]
    wlen_ok = F.when((wlen >= 2.0) & (wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + wlen_ok) / 3.0, 6)


def repetition_signals(text: Column, n: int = 2) -> dict[str, Column]:
    """Gopher-style repetition quality signals (Rae et al. 2021, public):

    * ``dup_ngram_frac``  — fraction of word n-grams that are repeats of an
      earlier n-gram in the same document (templated/looping text scores
      high); 0.0 for docs with fewer than n tokens.
    * ``top_token_frac`` — frequency share of the most common token (a
      single token dominating the doc is the classic degenerate-generation
      signature); 0.0 for empty docs.

    Pure Column expressions — O(tokens·distinct) per row worst case, all
    inside whole-stage codegen, no UDF.
    """
    toks = tokens(text)
    m = F.size(toks) - (n - 1)
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_frac = F.when(
        m >= 1,
        (m - F.size(F.array_distinct(grams))) / m.cast("double"),
    ).otherwise(F.lit(0.0))
    # max token multiplicity as a run-length scan over the SORTED array
    # (r6): the former distinct×filter nest was O(tokens²) per document —
    # the single hottest expression of the text-quality projections. The
    # sorted-run maximum is the same integer (multiplicity of the most
    # common token), at O(n log n).
    srt = F.array_sort(toks)
    top_cnt = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(acc["prev"].isNotNull() & (acc["prev"] == t), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNotNull() & (acc["prev"] == t), acc["run"] + 1)
                .otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = F.when(
        F.size(toks) > 0, top_cnt.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))
    return {"dup_ngram_frac": dup_frac, "top_token_frac": top_frac}


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the canonicalized token stream (case/
    whitespace-insensitive). Rolling-hash analog that is portable across
    engines for oracle checks."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def token_histogram(df, text_col: str = "text", k: int | None = None):
    """Corpus vocabulary: (token, count) over whitespace tokens, optionally
    truncated to the top ``k`` by count (ties broken by token asc, so the
    cut is deterministic on any partitioning).

    Scale shape: explode → groupBy(token) is ONE shuffle with map-side
    partial counts (hot tokens like "the" arrive at the reducer as one
    partial per map task, never one row per occurrence, so token skew —
    Zipf by construction — cannot concentrate load); the top-k is a
    TakeOrderedAndProject over #distinct-tokens rows, which at vocab
    cardinality (~10^6-10^8) never touches the driver until the final k.
    Engine-portable: DuckDB reproduces it with regexp_split_to_array +
    unnest + the same (count DESC, token ASC) order.
    """
    hist = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if k is not None:
        hist = hist.orderBy(F.col("n").desc(), F.col("token")).limit(k)
    return hist
