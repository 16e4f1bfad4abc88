"""Text-analysis column builders (SURVEY §2.L additions).

Pure Column expressions (JVM-side, whole-stage codegen) shared by the
dedup/fingerprint/language/quality operators — no UDFs anywhere in these
hot paths, so they scale as plain map work at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: str | Column) -> Column:
    """Whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_shingles(text: str | Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array column (map-side only)."""
    w = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(w) - k, F.lit(-1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j + 1) for j in range(k)]
            ),
        )
    )


def char_shingles(text: str | Column, k: int = 5) -> Column:
    """Distinct character k-gram shingles (fingerprinting granularity)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - k + 1, F.lit(0))),
            lambda i: c.substr(i, F.lit(k)),
        )
    )


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash from md5 — identical in DuckDB via
    ('0x' || substr(md5(x),1,15))::BIGINT (cross-engine verified)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# Tiny per-language marker-word lists for the heuristic language scorer.
# Deterministic, SQL-expressible; linguistic accuracy is NOT the contract —
# argmax semantics are (the corpus is synthetic bag-of-words).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "row", "table"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "zh": ("de", "shi", "bu", "le", "zai", "ren", "you"),
}


def lang_score(text: str | Column, lang: str) -> Column:
    """Fraction of tokens that are marker words for `lang`."""
    toks = tokens(text)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return hits / F.size(toks)


def winnow_fingerprints(text: str | Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing selection (Schleimer et al., MOSS): array of
    struct<pos, fp> — per window of ``w`` consecutive char-``k``-gram md5
    hashes, the minimum hash (rightmost on ties), 1-based gram position.
    Pure map-side array expressions; texts shorter than w + k - 1 yield
    an empty array. Used by j39; duplicates across overlapping windows
    are collapsed by the caller's DISTINCT."""
    c = F.col(text) if isinstance(text, str) else text
    grams_expr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(0))),
        lambda i: F.md5(F.substring(c, i, k)),
    )
    def _sel(grams):
        win = lambda i: F.slice(grams, i, w)  # noqa: E731
        return F.when(
            F.size(grams) >= w,
            F.transform(
                F.sequence(F.lit(1), F.size(grams) - (w - 1)),
                lambda i: F.struct(
                    (
                        i
                        - 1
                        + (
                            F.lit(w + 1)
                            - F.array_position(
                                F.reverse(win(i)), F.array_min(win(i))
                            )
                        )
                    )
                    .cast("long")
                    .alias("pos"),
                    F.array_min(win(i)).alias("fp"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:bigint,fp:string>>"))
    return _sel(grams_expr)
