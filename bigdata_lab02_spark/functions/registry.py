"""SQL registration of the engine's function library.

The reference hard-codes every scalar function in Java mappers; our engine
exposes the same functions (SURVEY.md §2.1) on the SQL surface so any
pipeline expressible in the reference is expressible as a SQL string here.

Registration is via ``CREATE OR REPLACE TEMP FUNCTION``-style
``spark.udf.register`` only for the few lambdas SQL can't express inline;
everything else is documented as plain SQL idiom (kept in ``SQL_IDIOMS``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Pure-SQL equivalents of the reference's scalar functions — usable verbatim
# in spark.sql() (and, where noted, DuckDB). Kept as data so tests can assert
# the SQL surface covers §2.1.
SQL_IDIOMS: dict[str, str] = {
    "remove_special_chars": "regexp_replace({s}, '[^\\\\w\\\\s]', '')",
    "lowercase": "lower({s})",
    "tokenize": "filter(transform(split({s}, '\\\\s+'), t -> regexp_replace(lower(t), '[^\\\\w\\\\s]', '')), t -> t != '')",
    "fixed4": "format_string('%.4f', {x})",
    "parse_sparse_vector": "str_to_map({s}, ',', ':')",
    "natural_log": "ln({x})",
    "l2": "sqrt(aggregate({a}, 0.0d, (acc, v) -> acc + v * v))",
    "dot": "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)",
}


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotent no-op hook kept for API stability.

    Registering Python lambdas via ``spark.udf.register`` would put a
    row-at-a-time Python UDF on the SQL surface — the slow path. The engine
    instead ships every §2.1 scalar as a pure-SQL idiom (``SQL_IDIOMS``,
    JVM-side when inlined) plus DataFrame builders in ``functions.text`` /
    ``functions.vectors``. If a future operator genuinely needs a named SQL
    function, register it here.
    """
    _ = spark
    return None


# --------------------------------------------------------------------------
# SQL statement builders for the r8 operator families (r9, VERDICT r8
# item 6): the DataFrame operators in operators/html.py, curation.py,
# textstats.py and temporal.py re-expressed as plain Spark SQL over a
# named view — same expressions, same Catalyst plans, so a SQL-only
# client reaches the full curation surface. Parity with the DataFrame
# API is asserted in tests/test_sql_surface.py.


def sql_str(s: str) -> str:
    """Python string → Spark SQL string literal under the default parser
    (escaped string literals: backslashes and quotes need escaping —
    the regex patterns below are full of both)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def remove_nonprose_sql(expr: str) -> str:
    """SQL twin of operators.html.remove_nonprose over ``expr``."""
    from bigdata_lab02_spark.operators import html as hx

    out = f"regexp_replace({expr}, {sql_str(hx.SCRIPT_RE)}, '')"
    out = f"regexp_replace({out}, {sql_str(hx.STYLE_RE)}, '')"
    out = f"regexp_replace({out}, {sql_str(hx.COMMENT_RE)}, '')"
    return f"regexp_replace({out}, {sql_str(hx.CDATA_RE)}, '')"


def strip_html_sql(expr: str) -> str:
    """SQL twin of operators.html.strip_html over ``expr`` — same steps
    in the same order (the patterns are the very module constants the
    DataFrame kernel compiles, so the two surfaces cannot drift)."""
    from bigdata_lab02_spark.operators import html as hx

    out = remove_nonprose_sql(expr)
    out = f"regexp_replace({out}, {sql_str(hx.BLOCK_BREAK_RE)}, '\\n')"
    out = f"regexp_replace({out}, {sql_str(hx.TAG_RE)}, ' ')"
    for ent, ch in hx._ENTITIES:
        out = f"replace({out}, {sql_str(ent)}, {sql_str(ch)})"
    out = f"regexp_replace({out}, '[ \\\\t]+', ' ')"
    out = f"regexp_replace({out}, ' ?\\\\n ?', '\\n')"
    out = f"regexp_replace({out}, '\\\\n+', '\\n')"
    return f"btrim({out}, ' \\n')"


def html_extract_sql(
    view: str, html_col: str = "html", id_col: str = "doc_id"
) -> str:
    """Full SELECT statement: operators.html.extract_html over ``view``."""
    from bigdata_lab02_spark.operators import html as hx

    prose = remove_nonprose_sql(html_col)
    text = strip_html_sql(html_col)
    anchors = f"regexp_extract_all({prose}, {sql_str(hx.ANCHOR_RE)}, 0)"
    link_chars = (
        f"aggregate({anchors}, 0, (acc, s) -> acc + length({strip_html_sql('s')}))"
    )
    return f"""SELECT {id_col},
  {text} AS text,
  size(regexp_extract_all({html_col}, {sql_str(hx.OPEN_TAG_RE)}, 0)) AS n_tags,
  size({anchors}) AS n_links,
  CASE WHEN length({text}) > 0
    THEN least({link_chars} / length({text}), 1.0d)
    ELSE 0.0d END AS link_text_frac,
  CASE WHEN length({html_col}) > 0
    THEN 1.0d - length({text}) / length({html_col})
    ELSE 0.0d END AS markup_frac
FROM {view}"""


def c4_filters_sql(
    view: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> str:
    """Full SELECT statement: operators.curation.c4_filters over ``view``."""
    from bigdata_lab02_spark.operators.curation import (
        C4_BAD_DOC_MARKERS,
        C4_BAD_LINE_PHRASES,
        _C4_TERMINALS,
    )

    ends = " OR ".join(
        f"endswith(rtrim(l), {sql_str(p)})" for p in _C4_TERMINALS
    )
    phrases = " AND ".join(
        f"NOT contains(lower(l), {sql_str(p)})" for p in C4_BAD_LINE_PHRASES
    )
    nw = (
        "CASE WHEN trim(l) = '' THEN 0 "
        "ELSE size(split(trim(l), '\\\\s+')) END"
    )
    bad = " OR ".join(
        f"contains(lower({text_col}), {sql_str(m)})" for m in C4_BAD_DOC_MARKERS
    )
    return f"""WITH lined AS (
  SELECT {id_col}, {text_col}, split({text_col}, '\\n') AS lines FROM {view}),
kept AS (
  SELECT *, filter(lines, l -> ({ends})
    AND {nw} >= {min_words_per_line}
    AND {phrases}) AS kept_lines
  FROM lined),
joined AS (
  SELECT *, array_join(kept_lines, '\\n') AS clean_text,
    ({bad}) AS bad_doc
  FROM kept)
SELECT {id_col}, clean_text,
  size(lines) AS n_lines,
  size(kept_lines) AS n_kept_lines,
  size(regexp_extract_all(clean_text, '[.!?"]+', 0)) AS n_sentences,
  bad_doc AS bad_doc_marker,
  size(regexp_extract_all(clean_text, '[.!?"]+', 0)) >= {min_sentences}
    AND NOT bad_doc AS keep
FROM joined"""


def gopher_rules_sql(
    view: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> str:
    """Full SELECT statement: operators.textstats.gopher_rules over
    ``view`` (features + rule booleans + keep, same thresholds)."""
    from bigdata_lab02_spark.operators.textstats import (
        GOPHER_STOPWORDS,
        _BULLETS,
    )

    stops = ", ".join(sql_str(w) for w in GOPHER_STOPWORDS)
    bullets = ", ".join(sql_str(b) for b in _BULLETS)
    return f"""WITH t AS (
  SELECT {id_col}, {text_col} AS text,
    split(trim({text_col}), '\\\\s+') AS words,
    split({text_col}, '\\n') AS lines
  FROM {view}),
m AS (
  SELECT {id_col}, text, words, lines,
    CASE WHEN trim(text) = '' THEN 0 ELSE size(words) END AS n_words,
    size(lines) AS n_lines,
    aggregate(words, 0, (a, w) -> a + length(w)) AS word_chars,
    length(text) - length(replace(text, '#', '')) AS n_hash,
    size(regexp_extract_all(text, '\\\\.\\\\.\\\\.', 0)) AS n_ell,
    size(filter(lines, l -> substring(ltrim(l), 1, 1) IN ({bullets})))
      AS n_bullet,
    size(filter(lines, l -> endswith(rtrim(l), '...')
      OR endswith(rtrim(l), '…'))) AS n_ellline,
    size(filter(words, w -> w rlike '[A-Za-z]')) AS n_alpha,
    size(array_intersect(array_distinct(transform(words, w -> lower(w))),
      array({stops}))) AS n_stop_hits
  FROM t),
r AS (
  SELECT {id_col}, n_words,
    CASE WHEN n_words = 0 THEN 0.0d ELSE word_chars / n_words END
      AS mean_word_len,
    CASE WHEN n_words = 0 THEN 0.0d ELSE (n_hash + n_ell) / n_words END
      AS symbol_ratio,
    CASE WHEN n_lines = 0 THEN 0.0d ELSE n_bullet / n_lines END
      AS bullet_line_frac,
    CASE WHEN n_lines = 0 THEN 0.0d ELSE n_ellline / n_lines END
      AS ellipsis_line_frac,
    CASE WHEN n_words = 0 THEN 0.0d ELSE n_alpha / n_words END
      AS alpha_word_frac,
    n_stop_hits
  FROM m)
SELECT *,
  n_words >= {min_words} AND n_words <= {max_words} AS rule_word_count,
  mean_word_len >= 3.0d AND mean_word_len <= 10.0d AS rule_mean_word_len,
  symbol_ratio <= 0.1d AS rule_symbol_ratio,
  bullet_line_frac < 0.9d AS rule_bullet_lines,
  ellipsis_line_frac < 0.3d AS rule_ellipsis_lines,
  alpha_word_frac >= 0.8d AS rule_alpha_words,
  n_stop_hits >= 2 AS rule_stopwords,
  (n_words >= {min_words} AND n_words <= {max_words})
    AND (mean_word_len >= 3.0d AND mean_word_len <= 10.0d)
    AND symbol_ratio <= 0.1d AND bullet_line_frac < 0.9d
    AND ellipsis_line_frac < 0.3d AND alpha_word_frac >= 0.8d
    AND n_stop_hits >= 2 AS keep
FROM r"""


def url_filters_sql(
    view: str,
    suffixes,
    blocklist=(),
    url_col: str = "url",
    id_col: str = "doc_id",
) -> str:
    """Full SELECT statement: operators.url.url_filters over ``view`` —
    the r10 URL/domain tier on the SQL surface. ``suffixes`` and
    ``blocklist`` are literal string lists here (the SQL surface's dims
    compile to IN-lists — right for a SQL-only client's bounded lists;
    the DataFrame builder joins real dim tables instead). Same
    expressions, same single norm_url window shuffle; parity with the
    DataFrame API is asserted in tests/test_sql_surface.py."""
    from bigdata_lab02_spark.operators import url as ux

    sfx_list = ", ".join(sql_str(s) for s in suffixes)
    scheme_re = sql_str(ux.SCHEME_RE)
    scheme = f"lower(regexp_extract({url_col}, {scheme_re}, 1))"
    after = f"regexp_replace({url_col}, {scheme_re}, '')"
    hostport = (
        f"regexp_replace(lower(regexp_extract({after}, '^([^/?#]*)', 1)),"
        f" '^[^/?#@]*@', '')"
    )
    hostp = (
        f"CASE WHEN {scheme} = 'http'"
        f" THEN regexp_replace({hostport}, ':80$', '')"
        f" WHEN {scheme} = 'https'"
        f" THEN regexp_replace({hostport}, ':443$', '')"
        f" ELSE {hostport} END"
    )
    host = f"regexp_replace({hostport}, ':[0-9]+$', '')"
    track = ux.TRACKING_PARAMS_RE.replace("\\", "\\\\")
    rest = f"regexp_replace({after}, '^[^/?#]*', '')"
    rest = f"regexp_replace({rest}, '#.*$', '')"
    rest = f"regexp_replace({rest}, '&{track}=[^&]*', '')"
    rest = f"regexp_replace({rest}, '\\\\?{track}=[^&]*&', '?')"
    rest = f"regexp_replace({rest}, '\\\\?{track}=[^&]*$', '')"
    for pe, ch in ux.PERCENT_UNRESERVED:
        rest = f"replace({rest}, '{pe}', '{ch}')"
    rest = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    # a second CASE would re-expand the huge expression; nesting keeps
    # the leading-'?' fixup on the already-built string
    rest_fix = (
        "CASE WHEN startswith(rest0, '?') THEN concat('/', rest0)"
        " ELSE rest0 END"
    )

    def cand(k: int) -> str:
        return (
            f"CASE WHEN size(labels) >= {k + 1} THEN"
            f" array_join(slice(labels, size(labels) - {k - 1}, {k}), '.')"
            f" END"
        )

    def reg_take(k: int) -> str:
        return f"array_join(slice(labels, size(labels) - {k}, {k + 1}), '.')"

    registered = (
        f"CASE WHEN {cand(3)} IN ({sfx_list}) THEN {reg_take(3)}"
        f" WHEN {cand(2)} IN ({sfx_list}) THEN {reg_take(2)}"
        f" WHEN {cand(1)} IN ({sfx_list}) THEN {reg_take(1)}"
        f" END"
    )
    if blocklist:
        blk_list = ", ".join(sql_str(d) for d in blocklist)
        blocked = f"coalesce(registered_domain IN ({blk_list}), false)"
    else:
        blocked = "false"
    return f"""WITH u0 AS (
  SELECT {id_col}, {url_col} AS url, {scheme} AS scheme, {host} AS host,
    {hostp} AS hostp, {rest} AS rest0
  FROM {view}),
u1 AS (
  SELECT {id_col}, url, scheme, host,
    host RLIKE '^[0-9]{{1,3}}(\\\\.[0-9]{{1,3}}){{3}}$' AS host_is_ip,
    CASE WHEN scheme <> '' AND hostp <> ''
      THEN concat(scheme, '://', hostp, {rest_fix}) END AS norm_url,
    split(host, '\\\\.') AS labels
  FROM u0),
u2 AS (
  SELECT {id_col}, url, scheme, host, host_is_ip, norm_url,
    {registered} AS registered_domain
  FROM u1),
u3 AS (
  SELECT *, {blocked} AS blocked,
    CASE WHEN norm_url IS NOT NULL THEN
      row_number() OVER (PARTITION BY norm_url ORDER BY {id_col}) > 1
    ELSE false END AS is_dup
  FROM u2)
SELECT {id_col}, url, scheme, host, host_is_ip, norm_url,
  registered_domain, blocked, is_dup,
  scheme IN ('http', 'https') AND host <> '' AND NOT blocked
    AND NOT is_dup AS url_keep
FROM u3"""


def range_join_sql(
    points_view: str,
    intervals_view: str,
    ts_col: str = "ts",
    lo_col: str = "t_lo",
    hi_col: str = "t_hi",
    bin_seconds: int = 3600,
) -> str:
    """Full SELECT statement: operators.temporal.range_join over two
    views — the same binned equi-join composition (never a
    BroadcastNestedLoop theta-join)."""
    b = bin_seconds
    return f"""WITH p AS (
  SELECT *, floor(unix_timestamp({ts_col}) / {b}) AS __bin
  FROM {points_view}),
i AS (
  SELECT *, explode(sequence(floor(unix_timestamp({lo_col}) / {b}),
    floor(unix_timestamp({hi_col}) / {b}))) AS __bin
  FROM {intervals_view})
SELECT p.* EXCEPT (__bin), i.* EXCEPT (__bin)
FROM p JOIN i USING (__bin)
WHERE p.{ts_col} >= i.{lo_col} AND p.{ts_col} < i.{hi_col}"""


def bpe_tokenize_sql(
    view: str,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Full SELECT statement: operators.bpe.bpe_token_stats over
    ``view`` under a learned merge table (the ``train_bpe`` output) —
    the k merges compile to k chained literal replaces, same plan as
    the DataFrame builder."""
    sym = (
        f"concat(' ', regexp_replace(regexp_replace(regexp_replace("
        f"trim({text_col}), '\\\\s+', ' '), '([^ ])', '$1  '), "
        f"'   ', '  </w>   '), '</w> ')"
    )
    for left, right, _ in merges:
        pat = sql_str(f" {left}  {right} ")
        rep = sql_str(f" {left}{right} ")
        sym = f"replace({sym}, {pat}, {rep})"
    empty = f"trim({text_col}) = ''"
    return f"""SELECT {id_col},
  CASE WHEN {empty} THEN 0
    ELSE size(split(trim({sym}), '  +')) END AS n_tokens,
  md5(CASE WHEN {empty} THEN ''
    ELSE array_join(split(trim({sym}), '  +'), ' ') END) AS tokens_md5
FROM {view}"""
