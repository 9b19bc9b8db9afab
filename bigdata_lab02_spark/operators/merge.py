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
    check_unique_keys: bool | None = None,
) -> DataFrame:
    """Last-write-wins merge: rows of ``updates`` replace base rows with
    the same key; unmatched update rows are inserts; unmatched base rows
    pass through. Column sets must match (``unionByName``).

    Last-write-wins is only well-defined when the delta has AT MOST ONE row
    per key — duplicate delta keys would all survive the union and silently
    yield a multi-row "snapshot" per key. ``check_unique_keys`` guards
    that contract with a cheap count-vs-distinct job on the delta's key
    columns (raises ``ValueError`` on violation). Default ``None`` means
    "same as ``broadcast_updates``": a broadcastable delta is small enough
    that the check is ~free; for a big shuffled delta the caller opts in
    (or pre-dedupes with a window over an ordering column).

    NOTE the guard makes this call EAGER (it runs a Spark job before
    returning) and, to close the check/merge race, it pins the delta with
    ``localCheckpoint`` first: a non-deterministic delta source (sample,
    rand, shuffling-dependent limit) is evaluated ONCE, so the rows the
    uniqueness check saw are bit-for-bit the rows the merge unions in.
    Without the pin, a source that re-evaluates differently could pass the
    check yet still merge duplicates (TOCTOU). With the check disabled the
    plan stays fully lazy and nothing is checkpointed.

    Durability trade (ADVICE r6): ``localCheckpoint`` pins the delta to
    EXECUTOR-LOCAL storage — not a reliable checkpoint. Losing an
    executor between the uniqueness check and the merge action FAILS the
    job (the pinned blocks are gone and by design cannot be recomputed)
    rather than silently recomputing a delta the check never saw; rerun
    the merge. That fail-closed behavior is deliberate. For a
    DETERMINISTIC delta source where recompute is provably safe, the
    executor-loss-tolerant alternative is
    ``updates.persist(StorageLevel.DISK_ONLY)`` + ``count()`` before
    calling with ``check_unique_keys=False`` — there determinism, not
    pinning, guarantees check/merge agreement.

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
    if check_unique_keys is None:
        check_unique_keys = broadcast_updates
    if check_unique_keys:
        # Pin the delta so the checked rows ARE the merged rows (see
        # docstring); model-delta-sized by the broadcast contract.
        updates = updates.localCheckpoint()
        dup_keys = (
            updates.groupBy(*key_cols).count().where(F.col("count") > 1).count()
        )
        if dup_keys:
            raise ValueError(
                f"updates has {dup_keys} duplicate key(s) on {key_cols}; "
                "last-write-wins needs one delta row per key — pre-dedupe "
                "the delta or pass check_unique_keys=False to accept it"
            )
    delta_keys = updates.select(*key_cols)
    if broadcast_updates:
        delta_keys = F.broadcast(delta_keys)
    kept = base.join(delta_keys, key_cols, "left_anti")
    return kept.unionByName(updates)
