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


# ---------------------------------------------------- quantile registers


def quantile_registers(
    items: DataFrame,
    value_col: str = "value",
    id_col: str = "id",
    n_buckets: int = 32,
    k: int = 64,
) -> DataFrame:
    """Mergeable deterministic quantile registers (r14, VERDICT r13
    item 6) — the third profiling sketch next to CMS/HLL: length and
    score DISTRIBUTIONS at 100 TB without a global sort.

    Design: the Munro–Paterson / MRL line of deterministic quantile
    summaries (evenly spaced order statistics per shard, merged by
    weighted re-decimation) rather than KLL/t-digest — those two are
    RANDOMIZED (KLL's compaction coin, t-digest's merge-order
    dependence), and the house rule is that every register must replay
    bit-for-bit in a SQL oracle. Shards are EXPLICIT md5 buckets of
    the id (never physical partitions — partitioning is not a
    deterministic quantity), so the register table is a pure function
    of the data.

    Per bucket b = md5(id) mod ``n_buckets``: rank rows by
    (value, id) — a total order, so ties are deterministic — and keep
    the ``k`` evenly spaced knots r_i = the ranks where
    floor(r·k/n_b) increments (all rows when n_b ≤ k). Each knot
    carries ``mass`` = r_i − r_{i−1}: the EXACT count of rows it
    stands for (masses sum to n_b — nothing is approximated except
    which value represents an interval).

    Rank-error bound: a knot misstates the rank of the rows it covers
    by < its mass ≤ ceil(n_b/k), so an estimate's total rank error is
    < Σ_b n_b/k = N/k — ε = 1/k of the corpus, independent of bucket
    count (buckets exist for parallelism and mergeability, not
    accuracy). One exchange keyed by bucket (register-table-sized
    output, ≤ n_buckets·k rows); the rank window runs inside each
    bucket's shard.

    Returns (bucket, r, mass, value).

    SIZING RULE (the one scale seam, r15 — VERDICT r14 item 3): the
    rank window sorts ONE bucket's rows in one task, ~N/n_buckets rows.
    Pick n_buckets ≥ N·row_bytes / target_task_bytes (e.g. 100 TB of
    16-byte (value, id) rows at 256 MB/task → n_buckets ≈ 6.5M — fine,
    accuracy is independent of bucket count), or keep the small
    register table and use ``quantile_registers_twolevel``: the same
    bucket space, but each bucket's sort is pre-decimated across
    ``fanout`` sub-shards, so the biggest single-task sort shrinks to
    N/(n_buckets·fanout) at the cost of one extra 1/k of rank error."""
    if k <= 0 or n_buckets <= 0:
        raise ValueError(f"k={k}, n_buckets={n_buckets} must be positive")
    from pyspark.sql import Window

    b = (_h60(F.col(id_col).cast("string")) % n_buckets).alias("bucket")
    w = Window.partitionBy("bucket").orderBy(value_col, id_col)
    wb = Window.partitionBy("bucket")
    ranked = (
        items.select(b, F.col(value_col), F.col(id_col))
        .withColumn("r", F.row_number().over(w).cast("long"))
        .withColumn("n_b", F.count(F.lit(1)).over(wb).cast("long"))
    )
    # exact integer division (div), never double '/': floor(double)
    # can disagree with integer division at representability edges,
    # and the oracle replays this with DuckDB's exact '//'
    knots = ranked.where(
        F.expr(f"(r * {k}) div n_b > ((r - 1) * {k}) div n_b")
    )
    wk = Window.partitionBy("bucket").orderBy("r")
    return knots.select(
        "bucket",
        "r",
        (F.col("r") - F.coalesce(F.lag("r").over(wk), F.lit(0)))
        .cast("long")
        .alias("mass"),
        F.col(value_col).cast("long").alias("value"),
    )


def quantile_registers_twolevel(
    items: DataFrame,
    value_col: str = "value",
    id_col: str = "id",
    n_buckets: int = 32,
    k: int = 64,
    fanout: int = 32,
) -> DataFrame:
    """Two-level register build — the 100 TB path for the
    ``quantile_registers`` sort seam (r15, VERDICT r14 item 3): level
    one builds registers over ``n_buckets·fanout`` md5 sub-shards (the
    SAME md5 keying, so sub mod n_buckets IS the direct scheme's
    bucket — the bucket space is unchanged), which caps the biggest
    single-task sort at ~N/(n_buckets·fanout) rows; level two folds
    each bucket's ``fanout`` sub-register tables with one MRL
    re-decimation over register-table-sized data (≤ fanout·k knots per
    bucket). Total rank error ≤ 2/k of the corpus (1/k per level —
    the standard deterministic-merge bound), vs 1/k for the direct
    build; same (bucket, r, mass, value) contract, masses still sum
    to each bucket's exact row count.

    Deterministic end-to-end: sub-shard assignment is a pure md5
    function, the fold's knot order (value, sub, r) is total, so the
    register table replays bit-for-bit — property-tested against the
    direct build's error bound."""
    if fanout <= 0:
        raise ValueError(f"fanout={fanout} must be positive")
    from pyspark.sql import Window

    sub = quantile_registers(
        items, value_col=value_col, id_col=id_col,
        n_buckets=n_buckets * fanout, k=k,
    ).withColumnsRenamed({"bucket": "sub"})
    u = sub.withColumn("bucket", (F.col("sub") % n_buckets).cast("int"))
    w = Window.partitionBy("bucket").orderBy("value", "sub", "r")
    wb = Window.partitionBy("bucket")
    c = u.withColumn("cum", F.sum("mass").over(w).cast("long")).withColumn(
        "m_b", F.sum("mass").over(wb).cast("long")
    )
    knots = c.where(
        F.expr(f"(cum * {k}) div m_b > ((cum - mass) * {k}) div m_b")
    )
    wk = Window.partitionBy("bucket").orderBy("cum")
    return knots.select(
        "bucket",
        F.col("cum").alias("r"),
        (F.col("cum") - F.coalesce(F.lag("cum").over(wk), F.lit(0)))
        .cast("long")
        .alias("mass"),
        "value",
    )


def merge_quantile_registers(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Merge two register tables over the same bucket space: per
    bucket, the union of knots (ordered by value with a deterministic
    source/rank tiebreak) is re-decimated to ``k`` knots at the
    cumulative-mass steps where floor(cum·k/m_b) increments — the MRL
    merge. Masses stay exact counts (they sum to the merged bucket
    total); each merge adds ≤ 1/k to the rank-error bound (standard
    for deterministic summaries). Register-table-sized work only."""
    from pyspark.sql import Window

    u = a.withColumn("src", F.lit(0)).unionByName(
        b.withColumn("src", F.lit(1))
    )
    w = Window.partitionBy("bucket").orderBy("value", "src", "r")
    wb = Window.partitionBy("bucket")
    c = u.withColumn("cum", F.sum("mass").over(w).cast("long")).withColumn(
        "m_b", F.sum("mass").over(wb).cast("long")
    )
    knots = c.where(
        F.expr(f"(cum * {k}) div m_b > ((cum - mass) * {k}) div m_b")
    )
    wk = Window.partitionBy("bucket").orderBy("cum")
    return knots.select(
        "bucket",
        F.col("cum").alias("r"),
        (F.col("cum") - F.coalesce(F.lag("cum").over(wk), F.lit(0)))
        .cast("long")
        .alias("mass"),
        "value",
    )


def quantile_estimate(
    registers: DataFrame, qs: list[float]
) -> DataFrame:
    """Quantile estimates from a register table: order every knot by
    (value, bucket, r) — total and deterministic — take the running
    mass, and for each q report the first knot value whose cumulative
    mass reaches ceil(q·N). Register-table-sized sort (≤ buckets·k
    rows), one bounded pass; q is keyed in integer micro-units
    (``q_mu``) so the output is hash-comparable across engines.

    Returns (q_mu, est) sorted by q_mu."""
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    from pyspark.sql import Window

    w = Window.orderBy("value", "bucket", "r")
    cum = registers.select(
        "bucket", "r", "mass", "value",
        F.sum("mass").over(w).cast("long").alias("cum"),
    )
    n_total = F.max("cum").over(Window.partitionBy())
    qdf = registers.sparkSession.createDataFrame(
        [(int(round(q * 1_000_000)),) for q in sorted(qs)], "q_mu long"
    )
    return (
        cum.withColumn("n", n_total)
        .crossJoin(F.broadcast(qdf))
        .where(
            F.col("cum") * 1_000_000 >= F.col("q_mu") * F.col("n")
        )
        .groupBy("q_mu")
        .agg(F.min("value").alias("est"))
        .orderBy("q_mu")
    )
