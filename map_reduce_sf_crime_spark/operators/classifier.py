"""QC1 — trained discriminative quality classifier (round 8).

The supervised selection tier next to the engine's model-free
heuristics (TF2 commonness, TX7 Gopher rules), generative LM scorer
(QL1 stupid-backoff perplexity), and importance sampler (SM3 DSIR):
a logistic regression over hashed n-gram count features, the shape of
fastText's linear classifier (Joulin et al. 2016, public) and of the
LR-over-features quality filters described in public training reports
(e.g. GPT-3's Wikipedia/WebText-vs-Common-Crawl classifier, Brown et
al. 2020 Appendix A; CCNet, Wenzek et al. 2020). No reference
counterpart — a §2.11 training-data-pipeline component.

Split of labor (the TOK1 / pq_codebooks bounded-sample discipline):

- TRAINING data is labeled and therefore small by construction — the
  labeled sample's features are collected to the driver under a LOUD
  cap and full-batch gradient descent runs there in numpy float64
  (fixed iteration count, fixed operation order, zero-init — fully
  deterministic; re-training yields bit-identical weights). Sparse
  COO accumulation (``np.add.at``) — the dense doc×bucket matrix is
  never materialized.
- INFERENCE is corpus-scale and engine-exact: the trained weights are
  quantized ONCE to integer micro-units, and each document's score is
  the exact int64 sum  Σ_b c_b·w_µb + n·bias_µ  (n = the doc's total
  gram count, so the comparison ``score ≥ 0`` is the L1-normalized
  margin  Σ (c_b/n)·w_b + bias ≥ 0  scaled by n — no division, no
  float). The DuckDB twin (:func:`classifier_scores_sql`) takes the
  SAME quantized weight table and reproduces every score bit-for-bit.

Scale shape of scoring (the TF2/SM3 pattern): one tokenize pass;
per-(doc, bucket) counts collapse occurrences BEFORE the join; the
weight table is ≤ ``n_buckets`` rows — broadcast — so scoring adds NO
doc-keyed exchange; gram-less docs keep a deterministic score of 0.
At 100 TB the plan is one scan + one map-side-combined aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64_col, hash64_sql
from .sampling import DSIR_BUCKETS, _grams_col, _grams_sql

QC_SEED = "qclf"
#: micro-unit weight quantization (the µ-nat discipline: the only
#: float→int boundary, crossed once per BUCKET, never per doc)
QC_MICRO = 1_000_000
#: loud ceiling on labeled training docs — labeled data is small by
#: construction; a corpus-sized frame here is a caller bug, not a
#: scaling need (score the corpus with the trained model instead)
QC_MAX_TRAIN_DOCS = 200_000
#: loud ceiling on collected (doc, bucket) FEATURE rows — the actual
#: driver-memory bound behind QC_MAX_TRAIN_DOCS. A doc contributes at
#: most min(#distinct grams, n_buckets) rows, so the effective cap is
#: ``QC_MAX_TRAIN_DOCS * min(n_buckets, _)`` clamped here; ~64M Row
#: objects is already tens of GB of py4j deserialization, and a
#: labeled sample dense enough to exceed it is a genuine
#: shrink-the-sample situation, not a lift-the-cap one.
QC_MAX_TRAIN_ROWS = 64_000_000


@dataclass(frozen=True)
class QualityClassifier:
    """Trained model: per-bucket µ-unit weights + µ-unit bias, plus
    the featurization stamp (bucket count + hash seed) — scoring with
    a different featurization than training would silently scramble
    every feature, so the stamp travels with the weights."""

    weights_micro: tuple[int, ...]
    bias_micro: int
    n_buckets: int
    seed: str


def _doc_features(docs: DataFrame, n_buckets: int, seed: str) -> DataFrame:
    """Collapsed per-(doc, bucket) gram counts — one tokenize pass,
    occurrences folded before anything joins (the TF2 rule: a hot
    token costs one row per containing doc, never per occurrence)."""
    return (
        docs.select(
            "doc_id", F.explode(_grams_col(F.col("text"))).alias("_gram")
        )
        .select(
            "doc_id",
            F.pmod(hash64_col(F.col("_gram"), seed=seed), F.lit(n_buckets)).alias(
                "_bucket"
            ),
        )
        .groupBy("doc_id", "_bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def train_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    seed: str = QC_SEED,
    iters: int = 200,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> QualityClassifier:
    """Fit the classifier on labeled (doc_id, text) frames: ``pos`` =
    the quality target (e.g. a trusted curated slice), ``neg`` = the
    rejection class (e.g. a random corpus sample). Full-batch gradient
    descent on L1-normalized hashed-gram counts with L2 regularization
    — deterministic end to end (zero init, fixed ``iters``, numpy
    float64 in a fixed fold order), so retraining reproduces the exact
    same model. Docs with no grams carry no gradient and are dropped
    from training; at inference they score exactly 0 and are
    unconditionally kept (``classifier_scores``' n·bias term vanishes
    at n=0 — filter on ``n_tokens`` separately if empty docs should
    drop). Raises loudly above ``QC_MAX_TRAIN_DOCS`` — labeled sets
    are small by construction; cap the sample, don't lift the cap."""
    import numpy as np

    labeled = pos.select("doc_id", "text").withColumn(
        "_y", F.lit(1.0)
    ).unionByName(
        neg.select("doc_id", "text").withColumn("_y", F.lit(0.0))
    )
    feats = _doc_features(labeled, n_buckets, seed).join(
        labeled.select("doc_id", "_y"), "doc_id"
    )
    # local guard, not similarity's _bounded_collect: that helper's
    # message points at the banded-LSH/IVF tier, which is meaningless
    # advice in a TRAINING context. The row cap is sized from
    # n_buckets (a doc contributes at most min(n_buckets, distinct
    # grams) feature rows — never a fixed rows/doc guess), clamped at
    # QC_MAX_TRAIN_ROWS, the real driver-memory bound.
    row_cap = min(QC_MAX_TRAIN_DOCS * n_buckets, QC_MAX_TRAIN_ROWS)
    # persist across the guard-count + collect pair so the gram-explode
    # + join feature pipeline executes once per training call, not
    # twice; released in the finally — a training call is a bounded
    # one-shot, so the registry-tracked plan_cache (released only at
    # the next query build) would outlive its use
    feats = feats.persist()
    try:
        n_rows = feats.count()
        if n_rows > row_cap:
            raise ValueError(
                f"quality-classifier training: {n_rows} (doc, bucket) "
                f"feature rows exceed the driver-collect cap {row_cap} — "
                "shrink the labeled sample (training is driver-side by "
                "design; only SCORING is distributed) or reduce n_buckets"
            )
        rows = feats.collect()
    finally:
        feats.unpersist()
    if not rows:
        raise ValueError("no grams in the labeled sample — nothing to train on")
    lab: dict = {}
    for r in rows:
        if lab.setdefault(r.doc_id, r._y) != r._y:
            raise ValueError(
                f"doc_id {r.doc_id!r} appears in BOTH pos and neg — "
                "a conflicting label would silently double its "
                "features; disjoint the classes"
            )
    doc_ids = sorted(lab)
    if len(doc_ids) > QC_MAX_TRAIN_DOCS:
        raise ValueError(
            f"{len(doc_ids)} labeled docs exceeds QC_MAX_TRAIN_DOCS "
            f"({QC_MAX_TRAIN_DOCS}); train on a bounded labeled sample"
        )
    dpos = {d: i for i, d in enumerate(doc_ids)}
    m = len(doc_ids)
    ridx = np.array([dpos[r.doc_id] for r in rows], dtype=np.int64)
    cidx = np.array([r._bucket for r in rows], dtype=np.int64)
    cnt = np.array([r._c for r in rows], dtype=np.float64)
    y = np.array([lab[d] for d in doc_ids])
    n_doc = np.zeros(m)
    np.add.at(n_doc, ridx, cnt)
    vals = cnt / n_doc[ridx]  # L1-normalized features, sparse COO
    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(iters):
        margin = np.full(m, b)
        np.add.at(margin, ridx, vals * w[cidx])
        err = 1.0 / (1.0 + np.exp(-margin)) - y
        grad = np.zeros(n_buckets)
        np.add.at(grad, cidx, vals * err[ridx])
        w -= lr * (grad / m + l2 * w)
        b -= lr * float(err.mean())
    return QualityClassifier(
        weights_micro=tuple(int(v) for v in np.floor(QC_MICRO * w)),
        bias_micro=int(np.floor(QC_MICRO * b)),
        n_buckets=n_buckets,
        seed=seed,
    )


def classifier_scores(
    docs: DataFrame, model: QualityClassifier, base: DataFrame | None = None
) -> DataFrame:
    """Score every document with the trained model:
    ``(doc_id, qc_score_unat, qc_kept)`` where ``qc_score_unat`` =
    Σ c_b·w_µb + n·bias_µ (exact int64 — the L1-normalized margin
    scaled by the doc's gram count) and ``qc_kept = score ≥ 0``.
    Gram-less docs score 0 (kept — no evidence either way; filter on
    ``n_tokens`` separately if empty docs should drop). ``base``:
    optional one-row-per-doc spine to left-join onto (the
    unigram_commonness contract)."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(b, int(w)) for b, w in enumerate(model.weights_micro)],
        "_bucket int, _w long",
    )
    dt = _doc_features(docs, model.n_buckets, model.seed)
    scores = (
        dt.join(F.broadcast(wdf), "_bucket")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("_c") * F.col("_w"))
                + F.sum("_c") * F.lit(model.bias_micro)
            ).alias("qc_score_unat")
        )
    )
    spine = docs.select("doc_id") if base is None else base
    return spine.join(scores, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("qc_score_unat"), F.lit(0)).cast("long").alias(
            "qc_score_unat"
        ),
        (F.coalesce(F.col("qc_score_unat"), F.lit(0)) >= 0).cast("int").alias(
            "qc_kept"
        ),
    )


def classifier_scores_sql(
    model: QualityClassifier, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`classifier_scores` — the SAME quantized
    weight table (inlined as VALUES), the same hash/bucketing, the
    same exact-integer score arithmetic; bit-for-bit equal
    (tests/test_classifier.py)."""
    h = hash64_sql("_gram", seed=model.seed)
    wvals = ", ".join(
        f"({b}, {int(w)})"
        for b, w in enumerate(model.weights_micro)
        if w != 0
    ) or "(0, 0)"
    return f"""
    with _qc_w(_bucket, _w) as (values {wvals}),
    _qc_g as (
      select doc_id, unnest({_grams_sql('text')}) as _gram from {table}
    ),
    _qc_dt as (
      select doc_id, ({h} % {model.n_buckets}) as _bucket, count(*) as _c
      from _qc_g group by doc_id, ({h} % {model.n_buckets})
    ),
    _qc_s as (
      select d.doc_id,
             cast(sum(d._c * coalesce(w._w, 0))
                  + sum(d._c) * {model.bias_micro} as bigint)
               as qc_score_unat
      from _qc_dt d left join _qc_w w using (_bucket)
      group by d.doc_id
    )
    select t.doc_id,
           cast(coalesce(s.qc_score_unat, 0) as bigint) as qc_score_unat,
           cast(coalesce(s.qc_score_unat, 0) >= 0 as int) as qc_kept
    from {table} t left join _qc_s s using (doc_id)
    """
