"""Snapshot maintenance: MERGE/upsert a delta of changed rows into a base
table — the pattern behind incremental corpus refreshes (recrawled
documents replace stale copies, new documents append) without rewriting
the unchanged majority.

Spark's DataFrame API has no MERGE INTO statement (that's a table-format
feature — Delta/Iceberg); the RELATIONAL core of merge is expressible
exactly: anti-join the base against the delta's keys, union the delta.
This module implements that core declaratively so the semantics are
oracle-checkable; a production deployment points the same plan at a
format with transactional overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Last-write-wins merge: rows of ``updates`` replace base rows with
    the same key; unmatched update rows are inserts; unmatched base rows
    pass through. Column sets must match (``unionByName``).

    Shape: one LEFT ANTI join (base minus updated keys) + union. With
    ``broadcast_updates`` (the common case — a delta is small relative to
    the snapshot) the anti-join broadcasts the delta and the base NEVER
    shuffles; set it False when the delta is itself big data and let the
    join shuffle both sides by key. At table-format scale the same plan
    runs per partition after partition pruning on the delta's keys.
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"column mismatch: base {sorted(base.columns)} "
            f"vs updates {sorted(updates.columns)}"
        )
    delta_keys = updates.select(*key_cols)
    if broadcast_updates:
        delta_keys = F.broadcast(delta_keys)
    kept = base.join(delta_keys, key_cols, "left_anti")
    return kept.unionByName(updates)
