"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (enabled by the session factory) handles most
runtime skew; these helpers cover the cases AQE can't: a broadcast-too-big
dim joined on a hot key, and high-cardinality aggregations where one key
dominates (the classic 'null key' / boilerplate-document problem).

Salting trades one shuffle for k-way key spreading:
- join: fact key → (key, salt); dim rows replicated k times. The fact side
  (the 100 TB side) is never replicated.
- aggregation: two-phase — partial agg on (key, salt), final agg on key.
  For algebraic aggregates (sum/count/min/max) results are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, salt_buckets: int) -> Column:
    """Deterministic per-row salt: hash of the full row content.

    Deliberately NOT ``monotonically_increasing_id()`` — that expression is
    nondeterministic across stage retries, so a shuffle-fetch failure could
    re-salt recomputed rows into different buckets and silently drop or
    duplicate join output. Content hashing re-salts identically on retry
    (identical duplicate rows share a salt — slightly weaker spreading,
    never wrong)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)).cast(
        "int"
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated across ``salt_buckets`` salts
    so a hot fact key spreads over ``salt_buckets`` tasks.

    The salt column pair is dropped from the result; output equals the
    plain join row-for-row. Only fact-preserving join types are allowed —
    right/full would emit ``salt_buckets`` null-extended copies of every
    unmatched (replicated) dim row.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only, not {how!r} "
            "(unmatched dim rows are replicated per salt)"
        )
    fact_s = fact.withColumn("__salt", _row_salt(fact, salt_buckets))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = fact_s.join(dim_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial on (group, salt), final on group.

    ``aggs`` maps column → algebraic agg name ('sum'|'count'|'min'|'max').
    Result columns are named ``<agg>_<col>`` (count: ``count_<col>``).
    """
    salted = df.withColumn("__salt", _row_salt(df, salt_buckets))
    partial_exprs = []
    final_exprs = []
    for col, agg in aggs.items():
        name = f"{agg}_{col}"
        if agg == "count":
            partial_exprs.append(F.count(col).alias(name))
            final_exprs.append(F.sum(name).alias(name))
        elif agg == "sum":
            partial_exprs.append(F.sum(col).alias(name))
            final_exprs.append(F.sum(name).alias(name))
        elif agg == "min":
            partial_exprs.append(F.min(col).alias(name))
            final_exprs.append(F.min(name).alias(name))
        elif agg == "max":
            partial_exprs.append(F.max(col).alias(name))
            final_exprs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-algebraic aggregate {agg!r} cannot be salted")
    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*group_cols).agg(*final_exprs)
