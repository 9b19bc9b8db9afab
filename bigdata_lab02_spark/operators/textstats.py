"""Text analysis for training-data pipelines: token stats, quality scores,
language id, fingerprints.

All hot-path logic is built-in expressions (codegen'd, shuffle-free per-row
transforms); nothing here collects to the driver. Designed for a documents
table of arbitrary size: every function is a narrow projection — the only
shuffles are the explicit aggregations a caller asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.text import tokens_column

# A small English stopword core for ratio features (public-domain list).
_STOP_CORE = (
    "the of and a to in is was for on as with by at it from that this be are "
    "an or not but had has have his her their its they he she you we i"
).split()

# BPE-ish word-piece splitter: runs of letters, digits, or single other
# non-space chars — approximates subword token counts without a vocab.
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    """#whitespace-delimited tokens (cheap, locale-free)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_like_token_count(text: Column) -> Column:
    """#tokens under a BPE-ish regex (letters runs / digits / punct singles)
    — a deterministic stand-in for tokenizer-based counts."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), 0))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token statistics: counts, distinct counts, mean token length."""
    toks = tokens_column(F.col(text_col))
    return docs.withColumns(
        {
            "n_tokens": F.size(toks),
            "n_distinct_tokens": F.size(F.array_distinct(toks)),
            "mean_token_len": F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
                F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
                / F.size(toks)
            ),
            "n_ws_tokens": whitespace_token_count(F.col(text_col)),
            "n_bpe_tokens": bpe_like_token_count(F.col(text_col)),
        }
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality-filter features (length / punctuation / stopword
    ratios — the classic pre-training heuristics)."""
    text = F.col(text_col)
    toks = tokens_column(text)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(_STOP_CORE)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    n_char = F.length(text)
    return docs.withColumns(
        {
            "n_chars_m": n_char,
            "n_tokens": n_tok,
            "punct_ratio": F.when(n_char == 0, 0.0).otherwise(n_punct / n_char),
            "stopword_ratio": F.when(n_tok == 0, 0.0).otherwise(n_stop / n_tok),
            "mean_word_len": F.when(n_tok == 0, 0.0).otherwise(
                F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n_tok
            ),
        }
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar [0,1] quality score from the features — a monotone blend of
    'looks like prose' signals. Deterministic; tune weights per corpus."""
    feats = quality_features(docs, text_col)
    score = (
        0.4 * F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0))
        + 0.3 * (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0)))
        + 0.3 * F.least(F.col("stopword_ratio") * 3.0, F.lit(1.0))
    )
    # a doc with no tokens has no prose signal at all — don't let the
    # absence-of-punctuation term award it 0.3
    score = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(score)
    return feats.withColumn("quality_score", score)


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language id: scores per-language stopword hit rates and
    takes the argmax (n-gram-free variant that stays in codegen).

    With only ASCII synthetic text this is a plumbing demonstration; real
    corpora would swap in a character-n-gram profile model via mapInPandas.
    """
    profiles = {
        "en": ["the", "and", "of", "to", "is"],
        "es": ["el", "la", "de", "que", "los"],
        "fr": ["le", "la", "et", "les", "des"],
        "de": ["der", "die", "und", "das", "ist"],
    }
    toks = tokens_column(F.col(text_col))
    n = F.size(toks)
    scores = [
        (
            lang,
            F.when(n == 0, 0.0).otherwise(
                F.size(F.filter(toks, lambda t: t.isin(words))) / n
            ),
        )
        for lang, words in profiles.items()
    ]
    # argmax via greatest + chained when (4 langs — stays an expression)
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    pred = F.lit("und")
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0.0), lang).otherwise(pred)
    return docs.withColumn("pred_lang", pred)


def fingerprint(docs: DataFrame, text_col: str = "text", ngram: int = 5) -> DataFrame:
    """Document fingerprint: min-of-rolling-window hash over token n-grams
    (winnowing-style). xxhash64 built-in → one 64-bit fingerprint per doc;
    equal fingerprints ⇒ near-identical prefix content."""
    toks = tokens_column(F.col(text_col))
    grams = F.when(
        F.size(toks) < ngram, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - ngram),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, ngram)),
        )
    )
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    return docs.withColumn("fingerprint", F.array_min(hashes))
