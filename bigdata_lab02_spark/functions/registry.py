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
