"""Text-analysis column functions (north-star extension, SURVEY.md §2.C).

Everything here is built from JVM-side column expressions (split/transform/
filter/aggregate higher-order functions) — no Python UDFs in the hot path,
so whole-stage codegen applies and the functions cost the same as any other
projection at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the lang-ID heuristic. A production
#: model swaps in character n-gram profiles; the operator shape (score per
#: language → argmax) is identical.
STOPWORDS_BY_LANG: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "y", "de"),
    "zh": ("的", "了", "是", "我", "在"),
}


def words(text: Column) -> Column:
    return F.split(text, " ")


def lower_words(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are in ``stopwords`` (JVM-side filter)."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(lower_words(text), lambda w: F.array_contains(arr, w)))


def lang_scores(text: Column) -> list[Column]:
    """One ``score_<lang>`` column per language in STOPWORDS_BY_LANG."""
    return [
        stopword_hits(text, ws).alias(f"score_{lang}")
        for lang, ws in STOPWORDS_BY_LANG.items()
    ]


def quality_score_col(text: Column) -> Column:
    """Composite quality score in [0, 1]:

    0.4 · min(n_words/64, 1)  — length saturation
    0.3 · unique-token ratio  — lexical diversity
    0.3 · stopword ratio      — natural-language-ness
    Rounded to 6 dp for cross-engine float stability.
    """
    w = words(text)
    n = F.size(w)
    length_sat = F.least(n / F.lit(64.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(w)) / n.cast("double")
    stop_ratio = stopword_hits(text, ("the", "a")) / n.cast("double")
    return F.round(0.4 * length_sat + 0.3 * diversity + 0.3 * stop_ratio, 6)


def token_count_cols(text: Column) -> tuple[Column, Column, Column]:
    """(whitespace tokens, regex tokens, ~BPE tokens ≈ chars/4)."""
    ws = F.size(words(text)).cast("bigint")
    re_tokens = F.size(F.regexp_extract_all(text, F.lit("[a-z]+|[0-9]+"), 0)).cast(
        "bigint"
    )
    bpe = F.ceil(F.length(text) / F.lit(4.0)).cast("bigint")
    return ws, re_tokens, bpe


def doc_fingerprint(text: Column) -> Column:
    """md5 digest of the sorted distinct case-folded token set.

    Canonical content fingerprint: stable under token reordering and
    duplication, portable across engines (pure md5 of a deterministic
    string).
    """
    canon = F.array_join(F.array_sort(F.array_distinct(lower_words(text))), " ")
    return F.md5(canon)


def chunk_words(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 64,
    stride: int = 48,
):
    """Overlapping sliding-window chunking (see queries doc_chunk).

    Row-local: split once, explode a sequence() of start offsets, slice.
    Returns (id_col, chunk_idx, n_words, chunk_text); chunk_idx is dense
    from 0 and chunk i covers words [i*stride, i*stride + chunk).
    """
    ws = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(ws) - 1, F.lit(0)), F.lit(stride)
    )
    return df.select(
        id_col, ws.alias("_w"), F.explode(starts).alias("_s")
    ).select(
        id_col,
        (F.col("_s") / stride).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(chunk), F.size("_w") - F.col("_s"))
        .cast("bigint")
        .alias("n_words"),
        F.array_join(F.slice(F.col("_w"), F.col("_s") + 1, chunk), " ").alias(
            "chunk_text"
        ),
    )
