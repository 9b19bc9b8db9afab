"""Sources & sinks (SURVEY.md §2 S1-S3).

- ``corpus``    — S1: recursive text-directory scan with path-derived
                  (category, doc) identity.
- ``delimited`` — S2: whitespace/tab-delimited interchange formats the
                  reference uses between stages (COO matrix, dictionaries,
                  sparse vectors, 2-D points, weighted candidates).
- ``sinks``     — S3: text/parquet writers incl. the reference's
                  multi-named-output pattern (one logical job → several
                  named files) expressed as N independent writes.
- ``tables``    — parquet star-schema loader for the synthetic testdata.
"""

from bigdata_lab02_spark.sources.corpus import read_corpus  # noqa: F401
from bigdata_lab02_spark.sources.delimited import (  # noqa: F401
    read_coo_matrix,
    read_dictionary,
    read_points2d,
    read_sparse_vectors,
    read_weighted_vectors,
)
from bigdata_lab02_spark.sources.tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
