"""Text normalization & tokenization (SURVEY.md §2 P1, §2.1).

Reference semantics (``DataProcessing/task1_1.java:137-149``):
- split on whitespace,
- lowercase,
- strip every char outside ``[\\w\\s]`` (so ``don't`` → ``dont``,
  ``u.s.`` → ``us``),
- drop tokens that are empty after cleaning (``task1_1_1.java:111``).

All built-ins — ``split``/``lower``/``regexp_replace``/``filter`` — so the
tokenizer lives inside whole-stage codegen and vectorizes over the corpus
scan. Order of operations matters and matches the reference: split first,
then clean each token (cleaning the whole line first would merge
punctuation-separated words).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPECIAL = r"[^\w\s]"
_WS = r"\s+"


def normalize_token(col: Column) -> Column:
    """lowercase + strip non-word/space chars (task1_1.java:137-139,149)."""
    return F.regexp_replace(F.lower(col), _SPECIAL, "")


def tokens_column(line: Column) -> Column:
    """line → array<string> of normalized, non-empty tokens."""
    toks = F.split(line, _WS)
    cleaned = F.transform(toks, normalize_token)
    return F.filter(cleaned, lambda t: t != "")


def tokenize(df, line_col: str = "line", token_col: str = "token"):
    """Explode a line column into one row per normalized token (P1),
    preserving all other columns."""
    keep = [c for c in df.columns if c != line_col]
    return df.select(*keep, F.explode(tokens_column(F.col(line_col))).alias(token_col))
