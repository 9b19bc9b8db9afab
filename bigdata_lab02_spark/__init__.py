"""bigdata_lab02_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
NightFury02/BigData_Lab02 (a Hadoop MapReduce lab: a TF-IDF text-analytics
pipeline over a document corpus + three K-Means variants), built Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes: pushdown, pruning,
  broadcast joins, AQE),
- broadcast dimension joins instead of DistributedCache,
- cached DataFrames + driver-side model state instead of HDFS file round-trips
  between iterations,
- Arrow-vectorized pandas UDFs only where built-ins can't express the
  semantics (sparse-map cosine / squared distance).

Beyond reference parity, the engine adds the operators a large-scale
training-data pipeline needs: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, span/ExactSubstr, SemDeDup, embedding cosine), similarity
search (brute-force, LSH, IVF, int8 ANN), curation (scrubbing, chunking,
packing, hash splits, stratified sampling, DSIR, CCNet perplexity), text
analysis (language id, quality scoring, token counting, fingerprinting),
temporal joins (as-of, binned range join), skew/merge utilities, CMS/HLL
sketches, multimodal columns with REAL vendored codecs (PNG incl. 16-bit/
palette/Adam7/color keys/gray+alpha, baseline+progressive JPEG, 8/16/24-bit
WAV, Y4M), and Structured Streaming event aggregation with checkpoint
kill-resume recovery.

Package map
-----------
- ``session``    — SparkSession factory tuned for the target cluster profile
- ``sources``    — corpus / delimited-text / parquet readers, sinks
- ``functions``  — scalar & vector function library (text normalization,
                   sparse/dense vector math) registered for SQL use
- ``operators``  — the operator inventory from SURVEY.md §2 (encode, matrix,
                   category rollups, top-k, dedup, similarity, textstats,
                   kmeans) as composable DataFrame → DataFrame transforms
- ``plans``      — plan-inspection helpers (explain audits, shuffle counting)
- ``streaming``  — Structured Streaming event pipelines
"""

__version__ = "0.1.0"

from bigdata_lab02_spark.session import get_spark  # noqa: F401
