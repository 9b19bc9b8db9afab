"""Corpus-curation operators for training-data pipelines.

The ops between "raw crawl" and "training shard": scrub identifying
strings, measure repetition (the strongest cheap signal of boilerplate /
SEO spam — cf. the repetition filters in Gopher, Rae et al. 2021, and
RefinedWeb, Penedo et al. 2023), split deterministically into train/val/
test, and cap per-group token budgets.

All pure DataFrame expressions — no Python in the row path. Everything is
deterministic (hash-based, not RNG-based) so a 100 TB run is reproducible
and resumable: re-running a failed shard reproduces the same splits and
the same sample, and the DuckDB oracles replay the math exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_lab02_spark.functions.text import tokens_column

# ----------------------------------------------------------------- scrub

# Deliberately simple character-class patterns that mean the same thing in
# Java regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_text(
    text: Column,
    email_token: str = "<EMAIL>",
    url_token: str = "<URL>",
    ip_token: str = "<IP>",
) -> Column:
    """Replace emails, URLs, and IPv4 literals with placeholder tokens.
    Order matters: URLs first (an URL may embed an @ or dotted quad)."""
    out = F.regexp_replace(text, URL_RE, url_token)
    out = F.regexp_replace(out, EMAIL_RE, email_token)
    return F.regexp_replace(out, IPV4_RE, ip_token)


def scrub_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text, n_emails, n_urls, n_ips): scrubbed text plus counts
    of what was removed — pipelines keep the counts as quality features
    (documents stuffed with URLs are usually link farms)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        scrub_text(t).alias(text_col),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)).alias("n_ips"),
    )


# ----------------------------------------------------------- C4 cleaning

# Doc-level boilerplate markers (Raffel et al. 2020 §2.2): code-shaped or
# placeholder pages are dropped whole, not line-filtered.
C4_BAD_DOC_MARKERS = ["lorem ipsum", "{"]
# Line-level policy boilerplate: any line carrying one of these phrases
# is navigation/ToS chrome, not prose.
C4_BAD_LINE_PHRASES = ["javascript", "terms of use", "privacy policy", "cookie policy"]
_C4_TERMINALS = [".", "!", "?", '"']


def c4_filters(
    docs: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    passthrough: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020, §2.2): per-LINE keep rules —
    ends in terminal punctuation (``.!?"``), has ≥ ``min_words_per_line``
    whitespace words (paper default 5), carries no policy/JavaScript
    boilerplate phrase — then per-DOC verdicts: ≥ ``min_sentences``
    sentences survive (paper default 3, counted
    as terminal-punctuation runs in the kept text) and the raw text has no
    bad-document marker (``lorem ipsum``, ``{``).

    Returns ``clean_text`` (kept lines rejoined), the line/sentence
    counters, and ``keep``; ``passthrough`` names input columns carried
    into the output unchanged so pipeline compositions stay single-
    projection (no re-join on doc_id). Everything is ONE generated
    projection over
    two split arrays — no explode, no shuffle, fused with the scan; the
    100 TB shape is a pure map."""
    text = F.col(text_col)
    lower = F.lower(text)
    lines = F.split(text, "\n")

    def _line_ok(l: Column) -> Column:
        t = F.rtrim(l)
        low = F.lower(l)
        ends_ok = F.lit(False)
        for p in _C4_TERMINALS:
            ends_ok = ends_ok | t.endswith(p)
        n_words = F.when(F.trim(l) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(l), r"\s+"))
        )
        clean = F.lit(True)
        for ph in C4_BAD_LINE_PHRASES:
            clean = clean & ~low.contains(ph)
        return ends_ok & (n_words >= min_words_per_line) & clean

    kept = F.filter(lines, _line_ok)
    clean_text = F.array_join(kept, "\n")
    # sentence proxy: maximal runs of terminal punctuation in the kept text
    n_sentences = F.size(F.regexp_extract_all(clean_text, F.lit(r'[.!?"]+'), 0))
    bad_doc = F.lit(False)
    for m in C4_BAD_DOC_MARKERS:
        bad_doc = bad_doc | lower.contains(m)
    return docs.select(
        "doc_id",
        *passthrough,
        clean_text.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        bad_doc.alias("bad_doc_marker"),
        ((n_sentences >= min_sentences) & ~bad_doc).alias("keep"),
    )


# ------------------------------------------------------------ repetition


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc repetition ratios — the Gopher-style boilerplate signals:

    - ``dup_word_frac``: 1 − distinct/total whitespace words,
    - ``top_word_frac``: occurrences of the most frequent word / total,
    - ``dup_bigram_frac``: 1 − distinct/total adjacent word bigrams.

    Computed with array expressions in one projection — split once, derive
    all three from the same array (no explode, no shuffle; a pure map over
    the corpus that codegen fuses with the scan)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    # bigrams: zip words[0..n-2] with words[1..n-1]
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    nb = F.size(bigrams)
    # top-word count = longest equal run in the SORTED word array, found
    # with one linear fold (struct accumulator: previous word, current run,
    # best run). O(n log n) per row vs the O(n·distinct) of counting each
    # distinct word's occurrences separately.
    dw = F.array_distinct(words)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def _merge(acc, w):
        run = F.when(acc["prev"].isNull() | (acc["prev"] != w), F.lit(1)).otherwise(
            acc["run"] + 1
        )
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(F.array_sort(words), init, _merge, lambda acc: acc["best"])
    return docs.select(
        "doc_id",
        F.when(n > 0, 1.0 - F.size(dw) / n).otherwise(0.0).alias("dup_word_frac"),
        F.when(n > 0, top / n).otherwise(0.0).alias("top_word_frac"),
        F.when(nb > 0, 1.0 - F.size(F.array_distinct(bigrams)) / nb)
        .otherwise(0.0)
        .alias("dup_bigram_frac"),
    )


# Gopher repetition thresholds (Rae et al. 2021, App. A1.1): a doc is
# filtered when the named fraction EXCEEDS its threshold.
GOPHER_REP_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _dup_fold(arr: Column) -> Column:
    """struct(n, ch): occurrences beyond the first of each distinct value
    in ``arr`` and their total characters — one linear fold over the
    sorted array (O(n log n) per row, no explode)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("ch"),
    )

    def merge(acc, x):
        is_dup = acc["prev"].isNotNull() & (acc["prev"] == x)
        return F.struct(
            x.alias("prev"),
            F.when(is_dup, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            F.when(is_dup, acc["ch"] + F.length(x)).otherwise(acc["ch"]).alias("ch"),
        )

    return F.aggregate(
        F.array_sort(arr),
        init,
        merge,
        lambda a: F.struct(a["n"].alias("n"), a["ch"].alias("ch")),
    )


def _top_fold(arr: Column) -> Column:
    """struct(best, blen): highest occurrence count of any value in
    ``arr`` and that value's character length; count ties break to the
    lexicographically smallest value (strict ``>`` over the sorted scan),
    matching ``ORDER BY cnt DESC, value ASC LIMIT 1``."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("blen"),
    )

    def merge(acc, x):
        run = F.when(
            acc["prev"].isNull() | (acc["prev"] != x), F.lit(1).cast("long")
        ).otherwise(acc["run"] + 1)
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, F.length(x).cast("long"))
            .otherwise(acc["blen"])
            .alias("blen"),
        )

    return F.aggregate(
        F.array_sort(arr),
        init,
        merge,
        lambda a: F.struct(a["best"].alias("best"), a["blen"].alias("blen")),
    )


def _word_grams(words: Column, n: int) -> Column:
    """Space-joined word n-grams (empty array when fewer than n words)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def gopher_repetition(
    docs: DataFrame,
    text_col: str = "text",
    passthrough: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Gopher repetition verdicts (Rae et al. 2021, App. A1.1) — the
    line/paragraph/n-gram half that ``repetition_stats`` doesn't cover:

    - ``dup_line_frac`` / ``dup_para_frac``: occurrences beyond the first
      of each repeated line (newline split) / paragraph (blank-line
      split), over the total count;
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: characters in
      those beyond-first occurrences over total line/paragraph chars;
    - ``top_{2,3,4}gram_char_frac``: all occurrences of the most frequent
      word n-gram × its chars, over total word chars (count ties break
      to the lexicographically smallest gram);
    - ``dup_{5..10}gram_char_frac``: chars in beyond-first occurrences of
      repeated n-grams over total word chars — the simple estimate that
      counts overlapping occurrences separately (the paper dedups char
      positions; this is its cheap upper bound), clamped to 1.

    One ``rule_*`` boolean per fraction at the paper's thresholds
    (``frac <= threshold``) and ``keep`` = their conjunction. Entirely
    array folds in one generated projection — no explode, no shuffle, a
    pure map at any corpus size. Rules compare the UNROUNDED fractions
    (integer÷integer is bit-identical cross-engine); the returned
    fraction columns are rounded to 6 dp."""
    text = F.col(text_col)
    words_raw = F.split(F.trim(text), r"\s+")
    stage = docs.select(
        "doc_id",
        *passthrough,
        F.split(text, "\n").alias("_lines"),
        F.split(text, "\n\n").alias("_paras"),
        F.when(F.trim(text) == "", F.array().cast("array<string>"))
        .otherwise(words_raw)
        .alias("_words"),
    )
    lines, paras, words = F.col("_lines"), F.col("_paras"), F.col("_words")
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    para_chars = F.aggregate(
        paras, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    word_chars = F.length(F.array_join(words, ""))

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.least(num / den, F.lit(1.0))).otherwise(0.0)

    ldup, pdup = _dup_fold(lines), _dup_fold(paras)
    fracs: dict[str, Column] = {
        "dup_line_frac": ratio(ldup["n"], F.size(lines)),
        "dup_para_frac": ratio(pdup["n"], F.size(paras)),
        "dup_line_char_frac": ratio(ldup["ch"], line_chars),
        "dup_para_char_frac": ratio(pdup["ch"], para_chars),
    }
    for n in (2, 3, 4):
        top = _top_fold(_word_grams(words, n))
        fracs[f"top_{n}gram_char_frac"] = ratio(
            top["best"] * (top["blen"] - (n - 1)), word_chars
        )
    for n in range(5, 11):
        dup = _dup_fold(_word_grams(words, n))
        fracs[f"dup_{n}gram_char_frac"] = ratio(
            dup["ch"] - dup["n"] * (n - 1), word_chars
        )

    rules = {
        f"rule_{k}": fracs[k] <= GOPHER_REP_THRESHOLDS[k]
        for k in GOPHER_REP_THRESHOLDS
    }
    keep = F.lit(True)
    for r in rules.values():
        keep = keep & r
    return stage.select(
        "doc_id",
        *passthrough,
        *[F.round(fracs[k], 6).alias(k) for k in GOPHER_REP_THRESHOLDS],
        *[rules[f"rule_{k}"].alias(f"rule_{k}") for k in GOPHER_REP_THRESHOLDS],
        keep.alias("keep"),
    )


# -------------------------------------------------------------- splitting


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent hash:
    bucket = first 15 hex digits of md5(salt|key) as a fraction of 2^60,
    split = the range the fraction falls in (fractions in dict order).

    Hash-based, not ``randomSplit``: assignment is a pure function of the
    key, so it is stable across runs, executors, retries, AND engines (the
    DuckDB oracle reproduces it exactly) — and a document keeps its split
    when the corpus is re-sharded or appended to. ``salt`` gives
    independent re-draws for ablations.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    frac = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    expr = None
    hi = 0.0
    names = list(fractions)
    for name in names[:-1]:
        hi += fractions[name]
        cond = frac < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)


def stratified_sample(
    docs: DataFrame,
    group_col: str = "source",
    n_per_group: int | None = None,
    fraction: float | None = None,
    salt: str = "strat-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling (r8) — the draw every
    training-data pipeline needs for per-source quotas, eval carve-outs,
    and quick-look subsets. Pass exactly ONE of:

    - ``fraction``: keep a hash-Bernoulli ``fraction`` of each stratum
      (in expectation). A PURE FILTER on the ``hash_split`` key idiom —
      zero exchanges, fused into the scan, so sampling a 100 TB corpus
      costs one read. Membership is a pure function of (salt, id):
      stable across runs, retries, resharding, appends, and engines.
    - ``n_per_group``: exactly ``min(n, |stratum|)`` rows per
      ``group_col`` value, chosen by hash order (a seeded shuffle) —
      ONE exchange on the group key; adds a ``samp_rank`` column
      (1-based within the stratum). Ranks are stable for a fixed
      corpus; appending rows can displace earlier picks (quota
      semantics — documented, not a bug).

    Hash = the portable md5-top-60-bits idiom (``hash_split``,
    operators/dedup.py:273), so the DuckDB oracle replays the exact
    draw. ``salt`` gives independent re-draws for ablations."""
    if (n_per_group is None) == (fraction is None):
        raise ValueError("pass exactly one of n_per_group / fraction")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    if fraction is not None:
        if not 0.0 <= fraction <= 1.0:
            raise ValueError(f"fraction must be in [0, 1], got {fraction}")
        return docs.where(
            (h.cast("double") / F.lit(float(1 << 60))) < F.lit(float(fraction))
        )
    if n_per_group <= 0:
        raise ValueError(f"n_per_group must be positive, got {n_per_group}")
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("samp_rank", F.row_number().over(w))
        .where(F.col("samp_rank") <= n_per_group)
    )


# -------------------------------------------------------- token budgeting


def token_budget_sample(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap each group's token contribution: order docs within a group by a
    deterministic hash (an unbiased, reproducible shuffle), admit docs
    while the group's running token total stays within ``budget``.

    This is how mixture weights become shard contents: "no more than N
    tokens of source X". One window pass per group — the running sum is a
    prefix scan, no self-join, no driver loop. The first doc of a group is
    always admitted (a single doc larger than the budget still represents
    its group; matches the oracle's semantics).

    Returns (id, group, n_tokens, cum_tokens) for admitted docs.
    """
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    order = F.md5(F.concat_ws("|", F.col(group_col), F.col(id_col)))
    w = (
        Window.partitionBy(group_col)
        .orderBy(order, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = docs.select(
        F.col(id_col),
        F.col(group_col),
        n_tokens.alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return scored.where(
        (F.col("cum_tokens") <= budget)
        | (F.col("cum_tokens") == F.col("n_tokens"))
    )


# --------------------------------------------------------------- chunking


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window context chunking — the prep step between curated
    documents and fixed-context training sequences: each doc becomes
    chunks of ``chunk_tokens`` whitespace tokens starting every
    ``chunk_tokens - overlap`` tokens (the final chunk may be shorter;
    docs with zero tokens emit no chunks). A trailing window that would be
    entirely contained in the previous chunk (n_tokens % stride in
    (0, overlap]) is NOT emitted — it adds no new tokens, only duplicated
    content in the resulting shards.

    Pure array math per row — one ``sequence`` + ``transform`` + explode,
    no shuffle at all: chunking is embarrassingly parallel and stays
    pipelined inside whole-stage codegen on the scan. The chunk text
    itself travels as an md5 (cheap, engine-portable verification
    currency); a real shard writer would emit the token slice instead.

    Returns (id, chunk_idx, n_tokens, chunk_md5).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.col("toks")
    # 1 + ceil((size - chunk_tokens) / stride), floored at 1: the first
    # window always counts; further windows only while they reach past the
    # previous chunk's end (a pure-subset trailing window is skipped).
    n_chunks = F.greatest(
        F.lit(1),
        (
            F.lit(1)
            + F.ceil((F.size(toks) - F.lit(chunk_tokens)) / F.lit(float(stride)))
        ).cast("int"),
    )
    chunk = lambda i: F.slice(toks, i * stride + 1, chunk_tokens)  # noqa: E731
    return (
        docs.select(F.col(id_col), tokens_column(F.col(text_col)).alias("toks"))
        .where(F.size("toks") > 0)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.struct(
                        i.cast("int").alias("chunk_idx"),
                        F.size(chunk(i)).alias("n_tokens"),
                        F.md5(F.concat_ws(" ", chunk(i))).alias("chunk_md5"),
                    ),
                )
            ).alias("c"),
        )
        .select(id_col, "c.chunk_idx", "c.n_tokens", "c.chunk_md5")
    )


# ------------------------------------------------------- keep-best dedup


def keep_best_duplicate(
    docs: DataFrame,
    group_key: Column,
    score: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware dedup: within each duplicate group (``group_key`` —
    a content digest, near-dup fingerprint, or cluster id), keep the doc
    with the highest ``score`` (ties → smallest id). Unlike keep-first
    dedup, the survivor is the BEST duplicate, not an arbitrary one —
    pipelines keep the longest / cleanest copy of boilerplate families.

    One shuffle on the group key: every group row travels to its window
    partition before ranking (row_number does no map-side partial). If
    pre-exchange reduction ever matters at scale, the shape to reach for
    is a groupBy(max(score)) semi-join pre-filter — that aggregation DOES
    combine map-side. Returns (id, group, score, group_size, keep).
    """
    scored = docs.select(
        F.col(id_col), group_key.alias("grp"), score.alias("score")
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .withColumn("group_size", F.count("*").over(Window.partitionBy("grp")))
        .withColumn("keep", F.col("rank") == 1)
        .drop("rank")
    )


# ------------------------------------------------------ sequence packing


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy fixed-budget sequence packing: within each group, walk docs
    in id order and assign pack_id = floor(tokens-before-this-doc /
    budget) — the shard-assembly step that turns curated docs into
    fixed-context training sequences (a doc whose tokens straddle the
    boundary starts inside the earlier pack; real shard writers then
    truncate or pad).

    One prefix-scan window per group — partitioned by ``group_col``, so
    there is no single-partition global window to bottleneck at scale;
    parallelism = number of sources. Deterministic: a pure function of
    (group, id order), reproducible across runs and engines.

    Returns (id, group, n_tokens, pack_id).
    """
    toks = tokens_column(F.col(text_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = docs.select(
        F.col(id_col), F.col(group_col), F.size(toks).alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return scored.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(budget)))
        .cast("int")
        .alias("pack_id"),
    )


# ----------------------------------------------- importance resampling


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """DSIR-style importance scoring for data selection (Xie et al. 2023,
    arXiv:2302.03169): score every document by the log-likelihood ratio of
    a TARGET distribution vs the RAW corpus distribution over hashed word
    bigrams. High scores = documents that look like the target domain;
    select training data by sampling/thresholding on the score.

    Feature space: word bigrams hashed into ``n_buckets`` buckets with the
    engine-portable md5 idiom (first 15 hex digits → 60-bit int → mod).
    Both bucket models are add-``alpha`` smoothed categorical
    distributions; per-bucket log-weights are rounded at ``round_dp``
    before the per-doc sum (cross-engine summation stability) and the sum
    is rounded again.

    Scale shape: one explode over bigram occurrences feeds BOTH count
    models (target = filtered aggregate of the same pass); the per-bucket
    weight table is ≤ ``n_buckets`` rows and broadcasts back onto the
    occurrence stream, so the only data-sized exchange is the final
    per-doc aggregation. Nothing is all-pairs and no model state visits
    the driver.

    Returns (id, is_target, n_bigrams, score) for every input document
    (docs with < 2 tokens score 0.0 over 0 bigrams).
    """
    toks = tokens_column(F.col(text_col))
    base = docs.select(
        F.col(id_col), is_target.alias("is_target"), toks.alias("toks")
    )
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("toks"), 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    occ = (
        base.where(n >= 2)
        .select(id_col, "is_target", F.explode(bigrams).alias("bigram"))
        .select(
            id_col,
            "is_target",
            (
                F.conv(F.substring(F.md5(F.col("bigram")), 1, 15), 16, 10)
                .cast("long")
                % n_buckets
            ).alias("bucket"),
        )
    )
    counts = occ.groupBy("bucket").agg(
        F.count("*").alias("r_cnt"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_cnt"),
    )
    totals = counts.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    b = float(n_buckets)
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("t_cnt") + alpha) / (F.col("t_tot") + alpha * b))
            - F.log((F.col("r_cnt") + alpha) / (F.col("r_tot") + alpha * b)),
            round_dp,
        ).alias("w"),
    )
    scored = (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("w"), round_dp).alias("score"),
        )
    )
    return (
        base.select(id_col, "is_target")
        .join(scored, id_col, "left")
        .select(
            id_col,
            "is_target",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("score", F.lit(0.0)).alias("score"),
        )
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    token_budget: int,
    n_buckets: int = 256,
    alpha: float = 1.0,
    temperature: float | None = 1.0,
    seed: str = "dsir",
    num_partitions: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """DSIR SELECTION — the step scores exist for (Xie et al. 2023 §2.3):
    rank every document by importance and admit them in rank order until a
    global token budget is exhausted. Composes ``dsir_importance`` (the
    scores) with the prefix-scan admission rule of
    ``token_budget_sample`` (the budget).

    Ranking key: with ``temperature=None``, deterministic top-q
    (score DESC). Otherwise Gumbel-top-k sampling WITHOUT replacement
    proportional to softmax(score/temperature) (Vieira 2014's trick, the
    paper's sampled selection): key = score/T + Gumbel(0,1) noise, where
    the noise is derived from a seeded md5 of the doc id — an
    engine-portable PRNG, so an oracle replays the exact DRAW, not just
    the scores. Keys are rounded at ``round_dp`` (cross-engine libm ulp).

    The global budget needs a TOTAL-ORDER prefix sum; a bare global
    window would collapse to one partition, so it is computed distributed:
    range-repartition on (key DESC, id ASC), per-partition token sums →
    running partition offsets (a ≤num_partitions-row driver visit,
    model-state-sized — the kmeans-init seam), then a per-partition
    window adds each row's offset. ``localCheckpoint`` pins the
    partitioning so the offset pass and the output pass see identical
    placement. The globally-first document is always admitted even if it
    alone exceeds the budget (``token_budget_sample``'s rule).

    Returns (id, is_target, score, sel_key, n_tokens, cum_tokens) for the
    admitted subset.
    """
    scores = dsir_importance(
        docs,
        is_target,
        n_buckets=n_buckets,
        alpha=alpha,
        text_col=text_col,
        id_col=id_col,
        round_dp=round_dp,
    )
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    if temperature is None:
        key = F.col("score")
    else:
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % 1_000_000_000
            + 0.5
        ) / 1e9
        key = F.round(
            F.col("score") / temperature + -F.log(-F.log(u)), round_dp
        )
    keyed = scores.join(
        docs.select(F.col(id_col), n_tokens.alias("n_tokens")), id_col
    ).select(id_col, "is_target", "score", key.alias("sel_key"), "n_tokens")
    return _budget_admit(keyed, token_budget, id_col, "sel_key", num_partitions)


def _budget_admit(
    keyed: DataFrame,
    token_budget: int,
    id_col: str,
    key_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """TOTAL-ORDER budgeted admission (the dsir_select kernel, r13
    shared with quality_select): rows sorted by (key DESC, id ASC) are
    admitted until the global ``token_budget`` of ``n_tokens`` is
    spent; the globally-first row is always admitted even if it alone
    exceeds the budget. DISTRIBUTED global prefix sum:
    range-repartition on the order, per-partition token sums → running
    partition offsets (a ≤num_partitions-row driver visit, the
    model-state seam), per-partition window adds each row's offset.
    ``localCheckpoint`` pins the partitioning so the offset pass and
    the output pass see identical placement. Appends ``cum_tokens``."""
    spark = keyed.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    rp = (
        keyed.repartitionByRange(nparts, F.desc(key_col), F.asc(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    part_tot = rp.groupBy("__pid").agg(F.sum("n_tokens").alias("pt")).collect()
    offsets, acc = [], 0
    for r in sorted(part_tot, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], acc))
        acc += r["pt"]
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.desc(key_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        rp.join(F.broadcast(off_df), "__pid")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
    return cum.where(
        (F.col("cum_tokens") <= token_budget)
        | (F.col("cum_tokens") == F.col("n_tokens"))
    )


def lm_perplexity(
    docs: DataFrame,
    n_buckets: int = 512,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 6,
    split_quantiles: tuple[float, float] | None = None,
    approx_cutoffs: bool = False,
    approx_accuracy: int = 10000,
    lang_col: str | None = None,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document by the perplexity of a bigram language
    model trained on the corpus itself. Low perplexity = looks like the
    corpus's dominant register; the classic complement to DSIR (which
    ranks toward a TARGET) — perplexity ranks toward FLUENCY.

    Model: tokens hash into ``n_buckets`` buckets (the engine-portable
    md5 idiom), the LM is add-``alpha`` smoothed over bucket bigrams:
    p(b2|b1) = (c(b1,b2) + alpha) / (c(b1,·) + alpha·B). Per doc,
    nll = −mean ln p over its bigram occurrences and ppl = exp(nll).
    Log weights are quantized to INTEGER micro-units (round(ln·10^dp) as
    long) before the per-doc sum, so the aggregation is exact and
    order-independent across engines — a float sum of rounded doubles
    can still land a mean on a rounding boundary; an integer sum cannot.

    Scale shape: one explode over bigram occurrences feeds both count
    tables; the context table is ≤ B rows and broadcasts; the bigram
    table is data-sized but its join back onto the occurrence stream is
    a plain equi-join on (b1,b2) with map-side-combined counts — the
    same shuffle discipline as word count. No driver state, no
    all-pairs. Docs with < 2 tokens return n_bigrams=0, nll=0, ppl=1.

    ``split_quantiles`` (e.g. ``(1/3, 2/3)``) finishes the CCNet recipe
    (Wenzek 2020 §4.3): the corpus splits into perplexity terciles —
    ``ppl_bucket`` ∈ head (most fluent) / middle / tail. Cutoffs are
    quantiles over the INTEGER micro-unit nll (round(nll·10^dp) as
    long), not the float nll: both engines then interpolate over
    identical integers (exactly representable doubles), so a 1-ulp
    float-interpolation divergence near an x.5 boundary cannot flip a
    bucket. The comparison also runs in micro-units, so the decision is
    order-independent and cross-engine exact.

    Two cutoff modes. Exact (default, the gate/oracle form): Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, both type-7 — buffers
    the per-DOC micro-unit list on one reducer (doc-count-sized, not
    token-sized; an OOM at billions of docs). ``approx_cutoffs=True``
    is the scale form: ``percentile_approx`` (Greenwald–Khanna sketch,
    map-side-combined, bounded memory at any corpus size) at
    ``approx_accuracy``; it returns an actual data value instead of an
    interpolation, so at most the docs inside the sketch's rank-error
    band of each cutoff may change bucket — the bucket column is a
    selection decision, not an oracle surface, in that mode.

    Returns (id[, lang], n_bigrams, nll, ppl[, ppl_bucket]) for every
    input document.

    ``lang_col`` (r12, VERDICT r11 item 7) trains PER-LANGUAGE models —
    Wenzek 2020's actual shape (one LM per language, §4.3: "we train a
    language model per language"): the bigram/context counts group by
    (lang, bucket…), so the same text scores differently under an en-
    vs a de-trained model, and with ``split_quantiles`` the tercile
    cutoffs are per language too (a language's head is defined against
    its own fluency distribution, not the corpus mix). Scale shape is
    unchanged — the grouping keys just gain the language: the context
    table is ≤ n_langs·B rows (still broadcast), the bigram join is
    still a plain keyed equi-join, and the per-language cutoffs are a
    ≤ n_langs-row broadcast instead of a one-row crossJoin.
    """
    toks = tokens_column(F.col(text_col))
    lang = [lang_col] if lang_col else []
    base = docs.select(
        F.col(id_col), *[F.col(c) for c in lang], toks.alias("toks")
    )
    n = F.size("toks")
    bucket = lambda c: (  # noqa: E731 — md5 idiom, shared with dsir
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % n_buckets
    )
    pairs = F.zip_with(
        F.slice(F.col("toks"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("toks"), 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    occ = (
        base.where(n >= 2)
        .select(id_col, *lang, F.explode(pairs).alias("p"))
        .select(
            id_col,
            *lang,
            bucket(F.col("p.w1")).alias("b1"),
            bucket(F.col("p.w2")).alias("b2"),
        )
    )
    big = occ.groupBy(*lang, "b1", "b2").agg(F.count("*").alias("c12"))
    ctx = occ.groupBy(*lang, "b1").agg(F.count("*").alias("c1"))
    b = float(n_buckets)
    scale = float(10**round_dp)
    w = big.join(F.broadcast(ctx), [*lang, "b1"]).select(
        *lang,
        "b1",
        "b2",
        F.round(
            F.log((F.col("c12") + alpha) / (F.col("c1") + alpha * b)) * scale
        )
        .cast("long")
        .alias("lw6"),
    )
    scored = (
        occ.join(w, [*lang, "b1", "b2"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                -F.sum("lw6") / (F.count("*") * F.lit(scale)), round_dp
            ).alias("nll"),
        )
    )
    out = (
        base.select(id_col, *lang)
        .join(scored, id_col, "left")
        .select(
            id_col,
            *lang,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll", F.lit(0.0)).alias("nll"),
            F.round(F.exp(F.coalesce("nll", F.lit(0.0))), round_dp).alias("ppl"),
        )
    )
    if split_quantiles is None:
        return out
    q1, q2 = split_quantiles
    nll_mu = F.round(F.col("nll") * scale).cast("long")
    if approx_cutoffs:
        cut = lambda q, a: (  # noqa: E731
            F.percentile_approx(nll_mu, F.lit(q), F.lit(approx_accuracy))
            .cast("long")
            .alias(a)
        )
    else:
        cut = lambda q, a: (  # noqa: E731
            F.round(F.percentile(nll_mu, F.lit(q))).cast("long").alias(a)
        )
    if lang_col:
        # null-safe left join (r13, ADVICE r12): groupBy keeps NULL-lang
        # rows as their own cutoff group, but a plain inner equi-join
        # would then silently DROP them (NULL ≠ NULL in join keys) —
        # breaking the "for every input document" contract that the
        # split_quantiles=None path honors. eqNullSafe matches the NULL
        # group to its own cutoffs; left keeps the row-preserving
        # contract regardless. (ccnet's pred_lang falls back to 'und',
        # so the composed gates never exercised the hole.)
        cuts = out.groupBy(lang_col).agg(cut(q1, "__c1"), cut(q2, "__c2"))
        withc = out.join(
            F.broadcast(cuts.withColumnRenamed(lang_col, "__lc")),
            F.col(lang_col).eqNullSafe(F.col("__lc")),
            "left",
        ).drop("__lc")
    else:
        cuts = out.agg(cut(q1, "__c1"), cut(q2, "__c2"))
        withc = out.crossJoin(F.broadcast(cuts))
    return withc.withColumn(
        "ppl_bucket",
        F.when(nll_mu <= F.col("__c1"), F.lit("head"))
        .when(nll_mu <= F.col("__c2"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("__c1", "__c2").select(
        id_col, *lang, "n_bigrams", "nll", "ppl", "ppl_bucket"
    )


def ccnet_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    keep_langs: list[str] | None = None,
    keep_buckets: tuple[str, ...] = ("head", "middle"),
    n_buckets: int = 512,
    approx_cutoffs: bool = False,
    per_language: bool = False,
) -> DataFrame:
    """The CCNet curation chain (Wenzek et al. 2020) COMPOSED in its
    published order: cross-document LINE dedup (§3.1 — boilerplate out
    first) → language identification (the stopword prefilter face;
    §4.2) → corpus-LM perplexity terciles over the DEDUPED text (§4.3
    — training the LM after dedup is the point: repeated boilerplate
    would otherwise dominate the bigram counts and rank template pages
    as "fluent") → ``keep`` = language ∧ perplexity bucket (CCNet
    ships head+middle by default).

    Returns per doc: the deduped ``text``, ``n_lines``/``n_removed``
    from the dedup stage, ``pred_lang``/``lang_keep``,
    ``n_bigrams``/``nll``/``ppl``/``ppl_bucket``, and ``keep``.

    ``per_language=True`` (r12) trains one LM and one set of tercile
    cutoffs PER predicted language (Wenzek 2020 §4.3's published
    shape) instead of a single corpus model — same schema, scores and
    buckets computed within each language's own distribution.

    Scale shape: the dedup stage's three keyed exchanges, the LID
    projection (zero-shuffle), the perplexity stage's word-count-shaped
    shuffles, and ONE id-keyed join recombining the score columns with
    the deduped rows — everything linear and keyed, nothing all-pairs;
    ``approx_cutoffs=True`` is the bounded-memory tercile mode at
    production corpus sizes.

    The deduped corpus is PINNED once (``localCheckpoint``) before the
    branches consume it (r12, VERDICT r11 item 3): the LID branch, the
    LM-training/scoring branch and the final recombine all read the
    dedup result, and the compiled plan otherwise inlines the
    three-exchange dedup subtree into every consumer — measured 16
    posexplode copies / 30 exchanges with ZERO compile-time
    ReuseExchange (the branch projections prune different columns, so
    the exchanges are not structurally identical and nothing
    guarantees runtime reuse either). This is the ``_gate_vectors`` /
    ``selection_pipeline`` seam: a production run would materialize
    the dedup stage to parquet between pipeline phases; plan receipt
    asserted in tests/test_plans.py."""
    from bigdata_lab02_spark.operators.dedup import dedup_lines
    from bigdata_lab02_spark.operators.textstats import (
        language_id_stopword,
    )

    dl = dedup_lines(
        docs, text_col=text_col, id_col=id_col, min_docs=min_docs
    ).localCheckpoint()
    lid = language_id_stopword(dl, text_col=text_col)
    lang_keep = (
        F.col("pred_lang").isin(list(keep_langs))
        if keep_langs is not None
        else F.lit(True)
    )
    lid = lid.withColumn("lang_keep", lang_keep)
    if per_language:
        # Wenzek 2020's actual shape (r12, VERDICT r11 item 7): one LM
        # and one set of tercile cutoffs PER predicted language — the
        # LM source is the LID output, keyed by pred_lang. Pin it like
        # the dedup stage: the LM's count tables and the recombine all
        # consume it, and the ~90-lookup stopword-LID projection would
        # otherwise re-evaluate under every branch (measured 2.7× the
        # single-LM wall before the pin).
        lid = lid.localCheckpoint()
        ppl = lm_perplexity(
            lid.select(id_col, text_col, "pred_lang"),
            n_buckets=n_buckets,
            text_col=text_col,
            id_col=id_col,
            split_quantiles=(1 / 3, 2 / 3),
            approx_cutoffs=approx_cutoffs,
            lang_col="pred_lang",
        ).drop("pred_lang")
    else:
        ppl = lm_perplexity(
            dl.select(id_col, text_col),
            n_buckets=n_buckets,
            text_col=text_col,
            id_col=id_col,
            split_quantiles=(1 / 3, 2 / 3),
            approx_cutoffs=approx_cutoffs,
        )
    out = lid.join(ppl, id_col)
    return out.select(
        id_col,
        "n_lines",
        "n_removed",
        "pred_lang",
        "lang_keep",
        "n_bigrams",
        "nll",
        "ppl",
        "ppl_bucket",
        F.col(text_col),
        (
            F.col("lang_keep") & F.col("ppl_bucket").isin(list(keep_buckets))
        ).alias("keep"),
    )


def quality_classifier_train(
    docs: DataFrame,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """Model-based quality classifier TRAINING — the fourth standard
    selection family after rules (Gopher/C4), importance (DSIR) and
    perplexity (CCNet): DCLM (Li et al. 2024, "DataComp-LM") selects
    with a fastText-style linear scorer trained reference-vs-crawl.
    This is that family's exactly-replayable member: multinomial Naive
    Bayes over HASHED token buckets — per-bucket add-α log-likelihood
    ratios, closed-form in ONE aggregation pass (no SGD, so no
    iteration-order dependence; the linear decision surface is the
    same shape fastText learns over its hashed n-grams).

    ``positive`` labels the training rows (a boolean Column over
    ``docs`` — in the DCLM setup, membership in the reference corpus).
    Returns the model as ``(bucket, w_mu)``: exactly ``n_buckets``
    token rows (absent buckets carry the smoothing-only weight, so
    scoring needs no missing-key fallback) plus bucket −1 holding the
    class prior ``round(1e6·ln(N⁺/N⁻))`` over DOC counts. Every weight
    is an INTEGER micro-unit — the lm_perplexity discipline:
    ``w_b = round(1e6·(ln((c⁺_b+α)/(C⁺+αB)) − ln((c⁻_b+α)/(C⁻+αB))))``.
    A single-class corpus yields a NULL prior (scores go NULL —
    honest, not silently one-sided).

    Scale shape: one token explode → (bucket) count with conditional
    sums (map-side combined, ≤ B rows cross the shuffle) → a broadcast
    of the 1-row totals; the model is B+1 rows — broadcast by the
    scorer. Nothing all-pairs, nothing iterative."""
    from bigdata_lab02_spark.functions.text import tokens_column

    spark = docs.sparkSession
    toks = tokens_column(F.col(text_col))
    # a NULL label is UNLABELED, not negative — drop it from training
    # (boolean `otherwise` branches would otherwise silently fold NULL
    # into the negative class); scoring still covers every doc
    base = docs.select(positive.alias("__pos"), toks.alias("toks")).where(
        F.col("__pos").isNotNull()
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % n_buckets
    )
    occ = base.select("__pos", F.explode("toks").alias("tok")).select(
        "__pos", bucket.alias("bucket")
    )
    pos1 = F.when(F.col("__pos"), 1).otherwise(0)
    neg1 = F.when(F.col("__pos"), 0).otherwise(1)
    cnt = occ.groupBy("bucket").agg(
        F.sum(pos1).alias("cp"), F.sum(neg1).alias("cn")
    )
    tot = occ.agg(F.sum(pos1).alias("tp"), F.sum(neg1).alias("tn"))
    b = float(n_buckets)
    allb = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    weights = (
        allb.join(cnt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce("cp", F.lit(0)) + alpha)
                        / (F.col("tp") + alpha * b)
                    )
                    - F.log(
                        (F.coalesce("cn", F.lit(0)) + alpha)
                        / (F.col("tn") + alpha * b)
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("w_mu"),
        )
    )
    nd = base.agg(F.sum(pos1).alias("np"), F.sum(neg1).alias("nn"))
    prior = nd.select(
        F.lit(-1).cast("long").alias("bucket"),
        F.when(
            (F.col("np") > 0) & (F.col("nn") > 0),
            F.round(F.log(F.col("np") / F.col("nn")) * 1e6).cast("long"),
        ).alias("w_mu"),
    )
    return weights.unionByName(prior)


def quality_classifier_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    threshold_mu: int = 0,
) -> DataFrame:
    """Score every document with a ``quality_classifier_train`` model:
    ``score_mu = prior + Σ_tokens w_bucket(token)`` — an exact BIGINT
    sum of integer micro-unit weights, so ranking and the keep decision
    are engine-portable. Returns ``(id, n_toks, score_mu,
    quality_keep)`` for EVERY input doc; token-less docs score the
    prior alone; ``quality_keep = score_mu > threshold_mu`` (0 = the
    NB decision boundary; calibrate the threshold on a held-out stripe
    the way DCLM sweeps its top-p%).

    Scale shape: explode → broadcast model join (B rows) → one
    doc-keyed sum; compose the keep flag with the other selection
    stages (the filter is one fused projection once scores exist)."""
    from bigdata_lab02_spark.functions.text import tokens_column

    toks = tokens_column(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("toks"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % n_buckets
    )
    occ = base.select(F.col(id_col), F.explode("toks").alias("tok")).select(
        F.col(id_col), bucket.alias("bucket")
    )
    w = model.where(F.col("bucket") >= 0)
    prior = model.where(F.col("bucket") == -1).select(
        F.col("w_mu").alias("__prior")
    )
    s = (
        occ.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w_mu").alias("__s"))
    )
    return (
        base.select(F.col(id_col), F.size("toks").alias("n_toks"))
        .join(s, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.col(id_col),
            F.col("n_toks").cast("int").alias("n_toks"),
            (F.coalesce("__s", F.lit(0)) + F.col("__prior"))
            .cast("long")
            .alias("score_mu"),
            (
                F.coalesce("__s", F.lit(0)) + F.col("__prior")
                > F.lit(threshold_mu)
            ).alias("quality_keep"),
        )
    )


def quality_select(
    docs: DataFrame,
    model: DataFrame,
    token_budget: int,
    n_buckets: int = 512,
    num_partitions: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DCLM's actual selection step (Li et al. 2024 §4.4: score every
    document with the trained quality classifier, keep the TOP-p% —
    here expressed as the token-budget form every pretraining mix uses):
    ``quality_classifier_score`` ranks by the exact integer micro-unit
    score, then the shared ``_budget_admit`` kernel admits docs in
    (score DESC, id ASC) order until ``token_budget`` whitespace tokens
    are spent (globally-first doc always admitted — the
    token_budget_sample rule). Ranking — not the raw NB boundary — is
    the classifier's product: the decision threshold falls out of the
    budget, exactly DCLM's top-p% sweep.

    Returns (id, score_mu, n_tokens, cum_tokens) for the admitted
    subset. Scale shape: the scorer's broadcast-model pass + ONE
    range-repartition for the distributed global prefix — no
    one-partition global window, no driver-side data."""
    scored = quality_classifier_score(
        docs, model, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    keyed = scored.join(
        docs.select(F.col(id_col), n_tokens.alias("n_tokens")), id_col
    ).select(id_col, "score_mu", "n_tokens")
    return _budget_admit(
        keyed, token_budget, id_col, "score_mu", num_partitions
    )


# ----------------------------------------------- mixture sampling (r13)


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Source-weighted mixture under a global token budget — the "data
    mixing" stage of training-data assembly (The Pile, Gao et al. 2021,
    publishes exactly this shape: per-source weights times a global
    token target; DoReMi, Xie et al. 2023, learns the weights but
    SPENDS them the same way). Deterministic, exactly replayable:

    - per-group quota  = (token_budget * w_g) div sum(w)  — exact
      integers; groups absent from ``weights`` get quota 0 and are
      dropped (an explicit mixture is a whitelist);
    - within a group, docs are ordered by the portable md5 draw key
      ``md5(salt|id)`` (the ``hash_split`` idiom — change ``salt`` for
      an independent re-draw) and admitted while the group's running
      token sum stays within its quota; the group's FIRST doc is
      admitted even if it alone exceeds the quota, provided the quota
      is positive (the `_budget_admit` make-progress rule, per group).

    Scale shape — the part that must survive a 90%-one-source corpus:
    this does NOT window over the group key (a hot source would funnel
    into one sort task — the failure mode the bounded domain quota
    exists for). It reuses `_budget_admit`'s distributed prefix-sum
    discipline with GROUP-AWARE offsets: range-repartition on
    (group, draw key, id) spreads a mega-group across many range
    partitions; per-(partition, group) token totals come back as ONE
    bounded driver visit (≤ partitions × |weights| rows — the
    model-state seam), running offsets are computed per group and
    broadcast back, and each partition adds its offset to a LOCAL
    prefix window. `localCheckpoint` pins the partitioning so the
    offset pass and the output pass see identical placement (the
    ADVICE-r12 materialization rule).

    Returns admitted rows: (id, group, n_tokens, cum_tokens, quota).
    ``cum_tokens`` is the group-global running sum at the row,
    ``quota`` the group's token quota — both cross a gate hash.
    """
    if not weights:
        raise ValueError("weights must name at least one group")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive total")
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    spark = docs.sparkSession
    quota_rows = [
        (g, (token_budget * w) // wsum) for g, w in sorted(weights.items())
    ]
    quotas = F.broadcast(
        spark.createDataFrame(
            quota_rows, f"{group_col} string, quota long"
        )
    )
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col)))
    keyed = docs.join(quotas, group_col).select(
        F.col(id_col),
        F.col(group_col),
        F.size(tokens_column(F.col(text_col))).alias("n_tokens"),
        "quota",
        key.alias("__key"),
    )
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    rp = (
        keyed.repartitionByRange(
            nparts, F.asc(group_col), F.asc("__key"), F.asc(id_col)
        )
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # bounded driver visit: one row per (partition, group) present
    part_tot = (
        rp.groupBy("__pid", group_col)
        .agg(F.sum("n_tokens").alias("pt"))
        .collect()
    )
    offsets, acc = [], {}
    for r in sorted(part_tot, key=lambda r: (r[group_col], r["__pid"])):
        g = r[group_col]
        offsets.append((r["__pid"], g, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + r["pt"]
    off_df = F.broadcast(
        spark.createDataFrame(
            offsets, f"__pid int, {group_col} string, __off long"
        )
    )
    w = (
        Window.partitionBy("__pid", group_col)
        .orderBy(F.asc("__key"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        rp.join(off_df, ["__pid", group_col])
        .withColumn(
            "cum_tokens", F.sum("n_tokens").over(w) + F.col("__off")
        )
    )
    return cum.where(
        (F.col("cum_tokens") <= F.col("quota"))
        | (
            (F.col("cum_tokens") == F.col("n_tokens"))
            & (F.col("quota") > 0)
        )
    ).select(id_col, group_col, "n_tokens", "cum_tokens", "quota")
