"""Portable streaming-mergeable sketches: Count-Min and HyperLogLog.

The two workhorse sketches of a 100 TB profiling pass — heavy hitters
without a full groupBy-sort, and distinct counts without a distinct
shuffle — built ENTIRELY from deterministic md5 integer math so a DuckDB
oracle reproduces every register bit-for-bit. Spark ships both ideas
(``df.stat.countMinSketch``, ``approx_count_distinct``) but with
engine-internal seeded hashes that no other engine can replay; these
variants trade a little speed for cross-engine verifiability, which is
what makes them gateable.

Both sketches are ALGEBRAIC aggregates: registers merge by elementwise
add (CMS) / max (HLL), so Spark computes them map-side-combined in one
pass — the shuffle carries at most depth×width (CMS) or 2^p (HLL) rows
per partition, never the data.

- Count-Min (Cormode & Muthukrishnan 2005): depth hash rows × width
  buckets of counts; est(x) = min_d count[d][h_d(x)] ≥ true count.
- HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007): 2^p registers of
  max leading-zero ranks over a 60-bit md5 hash, harmonic-mean estimate
  with the standard small-range linear-counting correction.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 idiom shared with dedup/curation: first 15 hex digits → 60-bit int
_HASH_BITS = 60


def _h60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# ------------------------------------------------------------- Count-Min


def cms_sketch(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the Count-Min register table (seed, bucket, count) over an
    item stream. One groupBy keyed by (seed, bucket) — the explode factor
    is ``depth`` (a constant), and partial aggregation means the shuffle
    carries ≤ depth×width rows per map partition regardless of data size.
    Row d hashes with ``md5(d || '|' || item)`` (independent-enough rows,
    fully portable)."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    staged = items.select(F.col(item_col).alias("__it"), seeds)
    return (
        staged.select(
            "seed",
            (
                _h60(F.concat_ws("|", F.col("seed"), F.col("__it"))) % width
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("count"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    item_col: str = "item",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Heavy hitters with CMS estimates, verified against exact counts:
    item occurrences feed the sketch; candidate items are point-queried
    (est = min over rows of its bucket's count) and the top-``k`` by
    (est DESC, item ASC) are returned with their exact counts alongside.
    est ≥ exact ALWAYS (CMS never undercounts) — the gate's oracle
    re-derives both columns, so a single miscounted register flips the
    hash.

    ``candidates`` (a 1-column DataFrame of items, or None) is the
    profiling-scale knob (VERDICT r5 item 7): with None — the
    verification baseline — EVERY distinct item is point-queried, which
    is exhaustive and exact-rank-correct but enumerates the vocabulary.
    At profiling scale pass a candidate set (e.g. top-N from an exact
    pass over a sample, or a previous window's heavy hitters): the
    point-query side then touches only those items — the candidate set
    broadcasts as a semi-join filter, so the full stream is scanned ONCE
    for the sketch and once for candidate-only exact counts, and the
    vocabulary-sized distinct never materializes. The result is
    identical whenever the candidate set contains every item the
    EXHAUSTIVE pass would return — its top-k by ESTIMATE, which with
    adequate width is the true top-k but under heavy collision can
    include an inflated rare item; a candidate set built from exact
    counts cannot resurface such an item, which is the honest trade of
    candidate mode (you trade phantom heavy hitters away along with the
    vocabulary scan).

    Takes an ITEM STREAM (any exploded column — tokens, URLs, shingles);
    callers with several sketches over the same stream materialize it
    once and share it. Scale shape: the sketch is one map-side-combined
    groupBy; the point queries join the ≤ depth×width register table
    BROADCAST onto the (candidate-filtered) item table; exact counts are
    one more map-side-combined groupBy.
    """
    toks = items.select(F.col(item_col).alias("item"))
    sk = cms_sketch(toks, depth=depth, width=width)
    if candidates is not None:
        cand = candidates.select(
            F.col(candidates.columns[0]).alias("item")
        ).distinct()
        toks = toks.join(F.broadcast(cand), "item", "left_semi")
    exact = toks.groupBy("item").agg(F.count("*").alias("exact"))
    probes = exact.select(
        "item",
        "exact",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"),
    ).select(
        "item",
        "exact",
        "seed",
        (_h60(F.concat_ws("|", F.col("seed"), F.col("item"))) % width).alias(
            "bucket"
        ),
    )
    est = (
        probes.join(F.broadcast(sk), ["seed", "bucket"])
        .groupBy("item", "exact")
        .agg(F.min("count").alias("est"))
    )
    return (
        est.orderBy(F.desc("est"), F.asc("item"))
        .limit(k)
        .select("item", "est", F.col("exact").cast("long").alias("exact"))
    )


# ----------------------------------------------------------- HyperLogLog


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    items: DataFrame,
    item_col: str = "item",
    p: int = 9,
) -> DataFrame:
    """HyperLogLog register table (bucket, rho) over an item stream:
    bucket = top ``p`` bits of the 60-bit md5 hash; rho = 1 + number of
    leading zeros of the remaining ``60-p`` bits (computed with exact
    integer math via bin()-string length — no float log2 anywhere).
    One map-side-combined groupBy(max) keyed by bucket: the canonical
    mergeable distinct sketch."""
    rem_bits = _HASH_BITS - p
    h = _h60(F.col(item_col))
    w = h % F.lit(1 << rem_bits).cast("long")  # low 60-p bits
    bucket = F.shiftright(h, rem_bits)
    # bit_length(w) = length(bin-string without leading zeros) for w > 0
    rho = F.when(w == 0, F.lit(rem_bits + 1)).otherwise(
        rem_bits - F.length(F.conv(w, 10, 2)) + 1
    )
    return (
        items.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_distinct(
    items: DataFrame,
    item_col: str = "item",
    p: int = 9,
    round_dp: int = 2,
) -> DataFrame:
    """HLL distinct-count estimate as a 1-row DataFrame
    (m, n_used_buckets, estimate) with the standard small-range
    correction (linear counting when E ≤ 2.5·m and empty registers
    exist). The harmonic sum Σ2^−rho is computed as an exact BIGINT sum
    of 2^(S−rho) with S = 61−p = max rho (so exponents are in [0, S−1],
    never negative, and the total is ≤ m·2^S = 2^61 — no overflow for
    any valid p). Both engines then divide the SAME two exact integers —
    no float-sum-order hazard; the only floats are one division and one
    optional ln."""
    if not (8 <= p <= 16):
        raise ValueError("p must be in [8, 16]")
    m = 1 << p
    scale_exp = _HASH_BITS - p + 1  # = max possible rho
    regs = hll_registers(items, item_col=item_col, p=p)
    alpha = _hll_alpha(m)
    agg = regs.agg(
        F.count("*").alias("used"),
        # DataFrame shiftleft() only takes a literal shift; the SQL form
        # accepts a column expression for the per-register exponent.
        # coalesce: an EMPTY item stream has zero registers, sum() is NULL,
        # and a NULL harmonic sum would propagate to estimate=NULL — with 0
        # the linear-counting branch fires (used=0 ⇒ zeros=m) and the
        # estimate is exactly 0.0.
        F.coalesce(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {scale_exp} - CAST(rho AS INT))"
                )
            ),
            F.lit(0).cast("long"),
        ).alias("hsum_scaled"),
    )
    used = F.col("used")
    # registers never touched contribute 2^-0 = 1 each: (m - used) << S
    hsum = F.col("hsum_scaled") + (F.lit(m).cast("long") - used) * F.lit(
        1 << scale_exp
    ).cast("long")
    raw = F.lit(alpha * m * m) * F.lit(float(1 << scale_exp)) / hsum
    zeros = F.lit(m).cast("long") - used
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        used.cast("long").alias("n_used_buckets"),
        F.round(est, round_dp).alias("estimate"),
    )
