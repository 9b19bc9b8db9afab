"""Text→embedding featurizer (operators/embed.py): exact integer
contract replay, zero-vector edges, and the VERDICT-r13 agreement test
— derived-embedding dedup must agree with fixture-embedding dedup on
planted near-duplicates."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from bigdata_lab02_spark.operators.embed import (
    embed_featurize,
    embed_semantic_dedup,
)

MU = 1_000_000


def _py_embed(text: str, dim: int):
    """Driver-side replay of the module's integer contract."""
    tris = [text[i:i + 3] for i in range(len(text) - 2)] if len(text) >= 3 else []
    c = [0] * dim
    for t in tris:
        c[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim] += 1
    nrm = math.sqrt(sum(x * x for x in c))
    if nrm == 0:
        return len(tris), c
    return len(tris), [
        int(Decimal(MU * x / nrm).quantize(0, ROUND_HALF_UP)) for x in c
    ]


TEXTS = {
    0: "the cat sat on the mat",
    1: "completely different words in here",
    2: "xy",  # < 3 chars -> zero vector
    3: "",
    4: "the quick brown fox jumps over the lazy dog",
}


def test_featurize_matches_python_replay(spark):
    docs = spark.createDataFrame(
        list(TEXTS.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, [int(x) for x in r.embedding])
        for r in embed_featurize(docs, dim=16).collect()
    }
    assert set(got) == set(TEXTS)
    for k, t in TEXTS.items():
        assert got[k] == _py_embed(t, 16), f"doc {k}"


def test_zero_trigram_docs_keep_zero_vectors(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "abc")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_grams, list(r.embedding))
           for r in embed_featurize(docs, dim=8).collect()}
    assert got[1] == (0, [0.0] * 8)
    assert got[2] == (0, [0.0] * 8)
    assert got[3][0] == 1 and sum(got[3][1]) == MU  # one trigram: unit axis


def test_embedding_is_unit_micro_norm(spark):
    # ||e||^2 should be ~ (1e6)^2 up to per-element rounding (<= 0.5 each)
    docs = spark.createDataFrame(
        [(0, "some reasonably long text with several trigrams inside")],
        "doc_id long, text string",
    )
    (row,) = embed_featurize(docs, dim=32).collect()
    nrm = math.sqrt(sum(float(x) ** 2 for x in row.embedding))
    assert abs(nrm - MU) < 32  # dim * max elementwise rounding error


# ---- planted near-dup agreement: derived vs fixture embeddings ------

_GROUPS = [
    # three planted groups of near-identical texts + two singletons
    ["the cat sat on the mat and purred softly",
     "the cat sat on the mat and purred softly!",
     "the cat sat on the mat and purred loudly"],
    ["stock markets rallied after the earnings report today",
     "stock markets rallied after the earnings report, today"],
    ["entirely unrelated sentence about gardening tools"],
    ["quantum flux capacitors hum at forty kilohertz"],
]


def test_derived_dedup_agrees_with_fixture_dedup(spark):
    rows, fixture = [], []
    i = 0
    for g, texts in enumerate(_GROUPS):
        for j, t in enumerate(texts):
            rows.append((i, t))
            # fixture embedding: one axis per group, tiny per-member
            # jitter on a second axis -> within-group cosine ~1,
            # cross-group cosine 0 (the hand-made "true" geometry)
            v = [0.0] * 8
            v[g] = 1.0
            v[4 + g] = 0.01 * j
            fixture.append((i, v))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fix = spark.createDataFrame(
        fixture, "doc_id long, embedding array<float>"
    )

    from bigdata_lab02_spark.operators.similarity import (
        semantic_dedup_pipeline,
    )

    want = {
        r.doc_id: r.keep
        for r in semantic_dedup_pipeline(
            fix, threshold=0.9, id_col="doc_id", sample_mod=2, max_iter=2
        ).collect()
    }
    got = {
        r.doc_id: r.keep
        for r in embed_semantic_dedup(
            docs, dim=64, threshold=0.9, sample_mod=2, max_iter=2
        ).collect()
    }
    # the planted truth: first member of each group kept, later
    # near-identical members dropped, singletons kept — and both
    # embedding sources must agree on it
    truth = {0: True, 1: False, 2: False, 3: True, 4: False,
             5: True, 6: True}
    assert got == truth
    assert want == truth


def test_embed_semantic_dedup_featurize_pinned_once(spark):
    """r16 optimization contract: the featurize subtree (trigram
    explode + md5 — the gate's most expensive kernel) must be pinned
    before the dedup pipeline consumes it ~7 times. A pinned frame's
    leaves are ExistingRDD scans, so the compiled plan must contain NO
    repeated parquet/source leaves (the re-inlining class
    plan_report.repeated_scans exists for)."""
    from bigdata_lab02_spark.plans import plan_report

    import __spark_entry__ as e

    out = e.queries()["embed_semantic_dedup"](spark, "/root/testdata/sf0.01")
    r = plan_report(out)
    assert r.repeated_scans == 0, r.raw
