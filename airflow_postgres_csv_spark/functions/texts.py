"""Text-analysis column expressions — the building blocks for the
LLM-data-pipeline operators (SURVEY.md §2.3): tokenization, n-gram
shingling, fingerprinting, quality metrics, language-ID scoring.

Everything here is a pure Column expression built from JVM-side
``pyspark.sql.functions`` — no Python UDFs — so the whole text pipeline
stays inside whole-stage codegen and scales linearly with executors.

Determinism note: fingerprints use MD5 (bit-identical in every engine)
rather than xxhash64, so differential tests can check them; at 100 TB
swap ``F.md5`` for ``F.xxhash64`` (cheaper, same pipeline shape).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "tokens",
    "token_ngrams",
    "ngrams_of_tokens",
    "char_shingles",
    "bpe_ish_token_count",
    "fingerprint_md5",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_marker_hits",
    "top_token_count",
    "STOPWORDS_EN",
]

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish lexer: words | numbers | single punctuation — a cheap stand-in for
# subword tokenization with the same "count units" contract.
BPE_ISH_PATTERN = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: str | Column) -> Column:
    """Lowercase + collapse runs of whitespace + trim — the canonical form
    used for exact-dedup keys and fingerprints."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(normalize_text(col), " ")


def ngrams_of_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array column.

    ``toks`` must be a plain column reference (e.g. added via
    ``withColumn("_toks", tokens(text))``), not the tokenization
    expression itself: a free-standing expression referenced inside a
    higher-order-function lambda is re-evaluated per element, turning the
    normalize+split pipeline O(tokens²) per row (measured 8× slower on the
    documents corpus). Shingle i is tokens[i..i+n) joined by space; docs
    shorter than n yield [].
    """
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def token_ngrams(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>), the MinHash/Jaccard unit.

    Single-expression form. The tokenization is let-bound via a
    1-element-array transform so it evaluates once per row (lambda-bound
    variables are evaluated once; free expression references are not). In
    hot paths prefer ``withColumn("_toks", tokens(c))`` +
    :func:`ngrams_of_tokens` — a real projection is faster still.
    """
    return F.flatten(
        F.transform(F.array(tokens(col)), lambda t: ngrams_of_tokens(t, n))
    )


def char_shingles(col: str | Column, k: int = 8) -> Column:
    """Character k-shingles of the normalized text (array<string>).

    The normalized string is let-bound (see :func:`token_ngrams`) so the
    regex normalization runs once per row, not once per shingle.
    """
    return F.flatten(
        F.transform(
            F.array(normalize_text(col)),
            lambda s: F.when(
                F.length(s) < k, F.array().cast("array<string>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - (k - 1)),
                    lambda i: F.substring(s, i, k),
                )
            ),
        )
    )


def bpe_ish_token_count(col: str | Column) -> Column:
    """Token count under the BPE-ish lexer (long)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 1)).cast("long")


def fingerprint_md5(col: str | Column) -> Column:
    """Document fingerprint: MD5 of the normalized text (hex string)."""
    return F.md5(normalize_text(col))


def punct_ratio(col: str | Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    s = _c(col)
    stripped = F.regexp_replace(s, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.length(s)


def stopword_ratio(col: str | Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    return hits.cast("double") / F.size(toks)


def quality_score(col: str | Column) -> Column:
    """Composite 0-100 quality heuristic: length band + low punctuation +
    sane stopword presence. Deterministic integer arithmetic only."""
    s = _c(col)
    len_ok = (F.length(s) >= 100) & (F.length(s) <= 5000)
    punct_ok = punct_ratio(s) < 0.10
    stop_ok = stopword_ratio(s) > 0.01
    return (
        len_ok.cast("int") * 40 + punct_ok.cast("int") * 30 + stop_ok.cast("int") * 30
    ).alias("quality")


def top_token_count(toks: Column) -> Column:
    """Occurrence count of the most frequent token (int).

    Sorting the array groups equal tokens, so the mode count is the
    longest run in the sorted array — one ``F.aggregate`` pass with a
    (prev, run, best) accumulator. Stays map-only: the explode +
    groupBy(doc, token) + max alternative costs two shuffles at corpus
    scale for the same number.
    """
    s = F.array_sort(toks)
    return F.aggregate(
        s,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # marker stopwords per language for the n-gram/marker heuristic
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("de0",),  # placeholder marker; CJK needs char-ngram models
}


def lang_marker_hits(col: str | Column, lang: str) -> Column:
    """Count of marker-word hits for ``lang`` in the token stream."""
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(tokens(col), lambda x: x.isin(*markers))).cast("long")
