"""Similarity search over embedding columns.

Three tiers, mirroring how a 100 TB pipeline actually deploys ANN:

- **Brute-force top-k** (the correctness baseline): broadcast the
  (small) query set against the corpus, cosine per row via built-in
  higher-order functions, per-query top-k with a window over the
  already-reduced (query × corpus) score rows. Exact; cost is
  O(|Q|·N·d) fully data-parallel with no shuffle until the tiny
  top-k step.
- **Threshold self-join** (embedding near-dup for dedup): all-pairs
  within-corpus cosine ≥ t. Exact but quadratic — the oracle-checkable
  reference point for the LSH tier.
- **Random-hyperplane LSH**: deterministic md5-seeded hyperplanes →
  sign-bit signatures; banded buckets give candidate sets, exact
  cosine re-rank inside the bucket. Approximate (recall measured in
  tests against brute force), linear-ish — the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64_col, hash64_sql
from ..functions.vectors import cosine_col, cosine_sql

DIM = 64
# 32 planes in 8 × 4-bit bands: tuned on the fixture's near-orthogonal
# random vectors (hyperplane LSH's worst case — true neighbors sit at
# ~66°, P(bit agree) ≈ 0.63). Narrower bands trade candidate-set size
# for recall; measured recall ≈ 0.67 at ~6% of corpus scanned.
N_PLANES = 32
PLANE_BANDS = 8


def knn_bruteforce(
    emb: DataFrame, query_ids: list[int], k: int = 3
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairs = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def knn_bruteforce_sql(query_ids: list[int], k: int = 3, dim: int = DIM) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = cosine_sql("q.embedding", "e.embedding", dim)
    return f"""
    with q as (select vec_id as query_id, embedding from embeddings
               where vec_id in ({ids})),
    scored as (
      select q.query_id, e.vec_id, round({cos}, 6) as cosine
      from q join embeddings e on e.vec_id != q.query_id
    ),
    ranked as (
      select query_id, vec_id, cosine,
             row_number() over (partition by query_id
                                order by cosine desc, vec_id) as rk
      from scored
    )
    select query_id, vec_id, cosine, rk from ranked where rk <= {k}
    """


def cosine_near_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Exact all-pairs cosine ≥ t (embedding near-dup)."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_near_pairs_sql(threshold: float, dim: int = DIM) -> str:
    cos = cosine_sql("a.embedding", "b.embedding", dim)
    return f"""
    select a.vec_id as vec_a, b.vec_id as vec_b, round({cos}, 6) as cosine
    from embeddings a join embeddings b on a.vec_id < b.vec_id
    where round({cos}, 6) >= {threshold}
    """


def _plane_projection(p: int):
    """Signed projection of ``embedding`` on deterministic hyperplane
    ``p``: weights are seeded-md5 pseudo-randoms in [-1, 1), generated
    per (plane, dimension-index) — reproducible in SQL verbatim."""

    def weight(i):  # i is the 1-based dim index column
        h = hash64_col(F.concat(F.lit(f"{p}_"), i.cast("string")), seed="plane")
        return (h % 2001 - 1000) / 1000.0

    return F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda x, i: x.cast("double") * weight(i),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def plane_signatures(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Random-hyperplane sign signature (SimHash for vectors)."""
    sig = F.lit(0)
    for p in range(n_planes):
        sig = sig + F.when(_plane_projection(p) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    return emb.select("vec_id", sig.cast("long").alias("sig"))


def plane_signatures_sql(n_planes: int = N_PLANES, dim: int = DIM) -> str:
    terms = " + ".join(
        f"""(case when list_sum(list_transform(range(1, {dim + 1}),
              i -> embedding[i]::double *
                   (({hash64_sql(f"'{p}_' || i", seed='plane')} % 2001 - 1000) / 1000.0)))
              >= 0 then {1 << p} else 0 end)"""
        for p in range(n_planes)
    )
    return f"select vec_id, cast({terms} as bigint) as sig from embeddings"


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = N_PLANES,
    bands: int = PLANE_BANDS,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 signature band with the
    query; exact cosine re-rank within candidates. Recall vs brute
    force is measured in tests/test_similarity.py."""
    width = n_planes // bands
    mask = (1 << width) - 1
    sigs = plane_signatures(emb, n_planes)
    banded = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("sig"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.val")
    qb = banded.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "band", "val"
    )
    cands = (
        F.broadcast(qb)
        .join(banded, ["band", "val"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    cv = emb.select("vec_id", "embedding")
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )
