"""Decontamination operator: planted-overlap behavior and edge docs."""

from __future__ import annotations

from map_reduce_sf_crime_spark.operators.contamination import contamination

EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta theta"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_overlap_levels(spark):
    eval_docs = _df(spark, [(100, EVAL_TEXT)])
    train = _df(
        spark,
        [
            (1, EVAL_TEXT),  # exact copy -> frac 1.0
            # shares exactly one 5-gram window ("alpha beta gamma delta
            # epsilon") out of its own 5 distinct 5-grams
            (2, "alpha beta gamma delta epsilon one two three four"),
            (3, "totally different words with no overlap at all here"),
            (4, "too short"),  # < 5 tokens -> 0 n-grams
        ],
    )
    out = {
        r.doc_id: r
        for r in contamination(train, eval_docs, n=5, threshold=0.2).collect()
    }
    assert out[1].contam_frac == 1.0 and out[1].contaminated
    assert out[2].n_contaminated == 1 and out[2].n_ngrams == 5
    assert out[2].contaminated  # 0.2 threshold met exactly
    assert out[3].n_contaminated == 0 and not out[3].contaminated
    assert out[4].n_ngrams == 0 and out[4].contam_frac == 0.0
    assert not out[4].contaminated


def test_every_train_doc_reported_once(spark):
    eval_docs = _df(spark, [(9, EVAL_TEXT)])
    train = _df(spark, [(i, f"w{i} x y z q r s t") for i in range(20)])
    out = contamination(train, eval_docs)
    assert out.count() == 20
    assert out.select("doc_id").distinct().count() == 20
