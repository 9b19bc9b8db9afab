"""Scalar & vector function library (SURVEY.md §2.1).

Everything here is a Column-in/Column-out builder over built-in
``pyspark.sql.functions`` (JVM-side, codegen'd) unless the semantics force a
pandas UDF (sparse-map math). ``register_sql_functions`` exposes the library
to the SQL surface.
"""

from bigdata_lab02_spark.functions.text import (  # noqa: F401
    normalize_token,
    tokenize,
    tokens_column,
)
from bigdata_lab02_spark.functions.vectors import (  # noqa: F401
    array_cosine,
    array_dot,
    array_norm,
    map_cosine,
    map_dot,
    map_norm,
    map_sum_squares,
)
from bigdata_lab02_spark.functions.registry import register_sql_functions  # noqa: F401
