"""Parquet star-schema loader for the synthetic testdata.

``load_tables(spark, sf_dir)`` reads every table and registers temp views so
the same names work from both the DataFrame API and ``spark.sql``. Parquet +
declarative plans give us predicate pushdown / column pruning for free — the
scan only reads the columns and row groups a query touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = True) -> dict[str, DataFrame]:
    dfs: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
