"""Top-k helpers (global + grouped).

Global top-k: ``orderBy(...).limit(k)`` → Spark's ``TakeOrderedAndProject``
(per-partition bounded heap, driver merges k·P candidates — the distributed
generalization of the reference's bounded TreeMap, ``task1_3.java:86-92``).

Grouped top-k: ``row_number()`` over a per-group ordering window then
``<= k`` — one hash exchange on the group key; AQE handles skewed groups.
Ties are always broken by an explicit deterministic tiebreak column so
results are stable across partitionings (the reference's TreeMap collapses
ties — quirk Q2 — which we deliberately do NOT replicate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def grouped_top_k(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order)
    ranked = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return ranked if keep_rank else ranked.drop(rank_col)
