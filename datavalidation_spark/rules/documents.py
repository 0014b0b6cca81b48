"""Rule catalog for the flat ``documents`` testdata table
(doc_id, text, lang, source, n_chars) — the driver's corpus table.

These are the reference's scalar rule classes (range / missing / enum /
cross-field consistency — SURVEY.md §2.7) re-targeted at a document corpus:
each maps 1:1 onto a reference rule family, cited per rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datavalidation_spark.rules.core import Rule, in_range, nv

ALLOWED_LANGS = ("en", "es", "zh", "fr", "de")
N_CHARS_MAX = 1_000_000


def document_rules() -> list[Rule]:
    text, lang, n_chars = F.col("text"), F.col("lang"), F.col("n_chars")
    return [
        # missing checks (ref ME-MISS, me_consumption_validation.py:148-149)
        Rule(
            "DOC-TEXT-MISS",
            violation=text.isNull() | (F.length(text) == 0),
            remark="Text is missing or empty",
        ),
        # range check (ref ME-RANGE [0,50], me_consumption_validation.py:105-106)
        Rule(
            "DOC-NCHARS-RANGE",
            violation=~in_range(n_chars, 1, N_CHARS_MAX),
            remark=F.format_string(
                "n_chars %s outside [1, %d]", n_chars.cast("string"), F.lit(N_CHARS_MAX)
            ),
        ),
        # negative check (ref ME-NEG, me_consumption_validation.py:152-153)
        Rule(
            "DOC-NCHARS-NEG",
            violation=nv(n_chars < 0),
            remark="Negative n_chars",
        ),
        # cross-field consistency (ref SPD-RATIO speed vs distance/hours,
        # speed_validation.py:106-111): declared length must equal actual
        Rule(
            "DOC-NCHARS-MISMATCH",
            violation=nv(n_chars != F.length(text)),
            remark=F.format_string(
                "n_chars=%s but len(text)=%s",
                n_chars.cast("string"),
                F.length(text).cast("string"),
            ),
            where=text.isNotNull() & n_chars.isNotNull(),
        ),
        # enum membership (ref event enum, speed_validation.py:42-46)
        Rule(
            "DOC-LANG-ENUM",
            violation=lang.isNull() | ~lang.isin(*ALLOWED_LANGS),
            remark=F.format_string(
                "lang %s not in %s",
                F.coalesce(lang, F.lit("NULL")),
                F.lit(str(list(ALLOWED_LANGS))),
            ),
        ),
    ]
