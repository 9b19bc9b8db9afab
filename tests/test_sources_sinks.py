"""Sources/sinks round-trips: the reference's delimited interchange formats
and the multi-output sink pattern (SURVEY §2 S2/S3)."""

from pyspark.sql import functions as F

from bigdata_lab02_spark.sources import sinks
from bigdata_lab02_spark.sources.delimited import (
    read_coo_matrix,
    read_sparse_vectors,
    read_weighted_vectors,
)
from tests.conftest import KMEANS_INPUT


def test_tsv_roundtrip_coo(spark, tmp_path):
    coo = spark.createDataFrame(
        [(1, 2, 3), (4, 5, 6)], "doc_id int, term_id int, count long"
    )
    out = str(tmp_path / "coo")
    sinks.write_tsv(coo, out)
    back = read_coo_matrix(spark, out)
    assert sorted(map(tuple, back.collect())) == [(1, 2, 3), (4, 5, 6)]


def test_multi_output_sink(spark, tmp_path):
    base = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("parity")
    )
    sinks.write_multi(
        {
            "evens": base.where("parity = 0"),
            "odds": base.where("parity = 1"),
        },
        str(tmp_path / "multi"),
    )
    evens = spark.read.parquet(str(tmp_path / "multi/evens"))
    odds = spark.read.parquet(str(tmp_path / "multi/odds"))
    assert evens.count() == 5 and odds.count() == 5


def test_read_reference_weighted_vectors(spark):
    wv = read_weighted_vectors(spark, f"{KMEANS_INPUT}/weight.txt")
    rows = wv.collect()
    assert len(rows) == 31  # golden candidate count (BASELINE.md)
    assert all(r["weight"] >= 1.0 for r in rows)
    assert all(len(r["vec"]) > 0 for r in rows)


def test_sparse_vector_parse_matches_reference_format(spark):
    vecs = read_sparse_vectors(spark, f"{KMEANS_INPUT}/TFIDF.txt-r-00000")
    row = vecs.where(F.col("doc_id") == 1).collect()[0]
    # golden doc 1 starts "1\t24377:0.5234,24780:0.3079,..."
    assert abs(row["vec"][24377] - 0.5234) < 1e-12
    assert abs(row["vec"][24780] - 0.3079) < 1e-12


def test_sparse_vector_writer_roundtrip(spark, tmp_path):
    """write_sparse_vectors emits the reference TFIDF.txt format and
    read_sparse_vectors restores the exact same maps (doubles included)."""
    from bigdata_lab02_spark.sources.delimited import write_sparse_vectors

    vecs = spark.createDataFrame(
        [(1, {3: 0.125, 1: 2.5e-7}), (2, {9: 1.0}), (3, {})],
        "doc_id int, vec map<int,double>",
    )
    d = str(tmp_path / "vecs")
    write_sparse_vectors(vecs, d)
    back = {r["doc_id"]: r["vec"] for r in read_sparse_vectors(spark, d).collect()}
    assert back[1] == {3: 0.125, 1: 2.5e-7}
    assert back[2] == {9: 1.0}
    # entries are sorted by term id in the emitted text (deterministic)
    line = [
        ln for p in (tmp_path / "vecs").glob("part-*.txt")
        for ln in p.read_text().splitlines() if ln.startswith("1\t")
    ][0]
    assert line.split("\t")[1].startswith("1:")


class TestJsonl:
    def test_roundtrip_adversarial_text(self, spark, tmp_path):
        from bigdata_lab02_spark.sources.sinks import read_jsonl, write_jsonl

        rows = [
            (1, 'quotes " and \\ backslash'),
            (2, "newline\nand\ttab inside"),
            (3, "unicode: 中文 émoji 🎉"),
            (4, ""),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = str(tmp_path / "shards")
        write_jsonl(df, d)
        back = read_jsonl(spark, d, df.schema)
        got = {r["doc_id"]: r["text"] for r in back.collect()}
        # JSON escaping must carry every byte through, including embedded
        # newlines (escaped as \n inside the object, never a record break)
        assert got == dict(rows)
        assert back.schema == df.schema
