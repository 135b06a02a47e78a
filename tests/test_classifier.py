"""QC1 — trained quality classifier: separability semantics on a
planted fixture, DuckDB-twin bit-equality on the real documents
table, training determinism, an independent dense-numpy reference for
the optimizer, and the loud guards."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import classifier
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE

FLUENT = [
    "the merge window keeps clean sorted tables for the daily report",
    "a clean report explains the sorted daily tables in the window",
    "daily tables stay clean when the merge keeps the sorted window",
    "the report window shows clean daily tables after the merge",
]
GIBBERISH = [
    "zxq vploik wrtb nnsa qqal zzof",
    "bbnm xkcd plo qwe zzt ruyq",
    "aksj dfkl qpwo eiru tyzx cvbn",
    "mmzj kkwq ppol rrts uuvy xxze",
]


def _df(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _train_toy(spark):
    return classifier.train_quality_classifier(
        _df(spark, FLUENT), _df(spark, GIBBERISH, start=100), n_buckets=256
    )


def test_classifier_separates_planted_classes(spark):
    """Held-out recombinations of each class's vocabulary land on the
    right side of the margin."""
    model = _train_toy(spark)
    held = _df(
        spark,
        [
            "sorted tables keep the clean merge report",  # fluent-like
            "qwe zzt vploik aksj xxze",  # gibberish-like
        ],
        start=500,
    )
    got = {
        r.doc_id: (r.qc_score_unat, r.qc_kept)
        for r in classifier.classifier_scores(held, model).collect()
    }
    assert got[500][1] == 1 and got[501][1] == 0
    assert got[500][0] > 0 > got[501][0]


def test_classifier_training_is_deterministic(spark):
    m1, m2 = _train_toy(spark), _train_toy(spark)
    assert m1 == m2


def test_classifier_matches_dense_numpy_reference(spark):
    """The sparse-COO driver optimizer equals an independently written
    DENSE full-batch GD to float tolerance (different fold order, so
    allclose rather than bit-equality — the bit-exact surface is the
    quantized SCORES, pinned in the twin test)."""
    import numpy as np

    n_buckets, iters, lr, l2 = 64, 50, 1.0, 1e-4
    pos, neg = _df(spark, FLUENT), _df(spark, GIBBERISH, start=100)
    model = classifier.train_quality_classifier(
        pos, neg, n_buckets=n_buckets, iters=iters, lr=lr, l2=l2
    )
    labeled = pos.withColumn("_y", F.lit(1.0)).unionByName(
        neg.withColumn("_y", F.lit(0.0))
    )
    feats = classifier._doc_features(labeled, n_buckets, classifier.QC_SEED)
    rows = feats.join(labeled.select("doc_id", "_y"), "doc_id").collect()
    doc_ids = sorted({r.doc_id for r in rows})
    dpos = {d: i for i, d in enumerate(doc_ids)}
    X = np.zeros((len(doc_ids), n_buckets))
    y = np.zeros(len(doc_ids))
    for r in rows:
        X[dpos[r.doc_id], r._bucket] += r._c
        y[dpos[r.doc_id]] = r._y
    X = X / X.sum(axis=1, keepdims=True)
    w, b = np.zeros(n_buckets), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        w -= lr * (X.T @ err / len(y) + l2 * w)
        b -= lr * float(err.mean())
    assert np.allclose(
        np.array(model.weights_micro) / classifier.QC_MICRO, w, atol=2e-6
    )
    assert abs(model.bias_micro / classifier.QC_MICRO - b) < 2e-6


def test_classifier_duckdb_twin_bit_equality(spark):
    """Full-corpus scoring on the real documents table: the Spark
    plan and the DuckDB twin (same quantized weights, same hash, same
    integer arithmetic) agree on every score bit-for-bit."""
    docs = load_table(spark, SF_SMOKE, "documents")
    # labeled sample from the corpus itself: an arbitrary disjoint
    # hash split — the twin pin needs real trained weights, not a
    # meaningful quality signal
    pos = docs.filter(F.col("doc_id") % 7 == 0).limit(40)
    neg = docs.filter(F.col("doc_id") % 7 == 3).limit(40)
    model = classifier.train_quality_classifier(pos, neg, iters=50)
    got = {
        (r.doc_id, r.qc_score_unat, r.qc_kept)
        for r in classifier.classifier_scores(docs, model).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {
        tuple(r)
        for r in con.sql(classifier.classifier_scores_sql(model)).fetchall()
    }
    assert got == want and len(got) == docs.count()
    # the margin actually moves: not all docs on one side
    kept = {k for _, _, k in got}
    assert kept == {0, 1}


def test_classifier_loud_guards(spark):
    overlap = _df(spark, FLUENT)
    with pytest.raises(ValueError, match="BOTH pos and neg"):
        classifier.train_quality_classifier(overlap, overlap, n_buckets=64)
    empty = _df(spark, [""], start=900)
    with pytest.raises(ValueError, match="nothing to train"):
        classifier.train_quality_classifier(empty, empty, n_buckets=64)
    # gram-less docs score 0 / kept at inference (documented policy)
    model = _train_toy(spark)
    got = classifier.classifier_scores(_df(spark, [""], start=901), model).collect()
    assert got[0].qc_score_unat == 0 and got[0].qc_kept == 1


def test_classifier_row_cap_message_and_sizing(spark, monkeypatch):
    """The training-feature collect guard is LOCAL to the classifier:
    its message says to shrink the labeled sample (not similarity's
    banded-LSH/IVF advice, meaningless in a training context), and
    the cap is sized from n_buckets — a legitimate sample averaging
    >64 distinct buckets per doc no longer trips a fixed rows/doc
    guess (the round-8 ADVICE finding)."""
    # a 6-doc toy sample has far more than 6*... rows only if the cap
    # is tiny: force it down to prove the message and the raise path
    monkeypatch.setattr(classifier, "QC_MAX_TRAIN_ROWS", 3)
    with pytest.raises(ValueError, match="shrink the labeled sample"):
        _train_toy(spark)
    monkeypatch.undo()
    # sizing: with n_buckets buckets a doc can never contribute more
    # than n_buckets rows, so the effective cap admits any dense
    # legitimate sample (>64 rows/doc) below QC_MAX_TRAIN_DOCS docs
    dense = [" ".join(f"w{i}t{j}" for j in range(80)) for i in range(3)]
    model = classifier.train_quality_classifier(
        _df(spark, dense),
        _df(spark, GIBBERISH, start=100),
        n_buckets=4096,
    )
    assert model.n_buckets == 4096
