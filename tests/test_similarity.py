"""ANN quality: LSH top-k recall vs brute force; cosine sanity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.functions.vectors import cosine_col
from map_reduce_sf_crime_spark.operators import similarity
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_CHECK

QUERY_IDS = list(range(10))


def test_cosine_self_is_one(spark):
    emb = load_table(spark, SF_CHECK, "embeddings").limit(5)
    vals = emb.select(
        F.round(cosine_col(F.col("embedding"), F.col("embedding")), 9).alias("c")
    ).collect()
    assert all(abs(r.c - 1.0) < 1e-9 for r in vals)


def test_ann_lsh_recall(spark):
    emb = load_table(spark, SF_CHECK, "embeddings")
    brute = similarity.knn_bruteforce(emb, QUERY_IDS, k=3).collect()
    approx = similarity.ann_lsh_topk(emb, QUERY_IDS, k=3).collect()
    bset = {(r.query_id, r.vec_id) for r in brute}
    aset = {(r.query_id, r.vec_id) for r in approx}
    recall = len(bset & aset) / len(bset)
    # near-orthogonal random vectors are ANN's worst case; the banded
    # 16-plane signature must still recover a solid fraction of true
    # neighbors while scanning only bucket collisions
    assert recall >= 0.5, f"recall {recall}"
    # every reported neighbor must carry its true cosine (verified
    # exact inside candidates): reported ⊄ brute is fine, but any
    # (q, v) also in brute must agree on the score
    bscore = {(r.query_id, r.vec_id): r.cosine for r in brute}
    for r in approx:
        if (r.query_id, r.vec_id) in bscore:
            assert abs(bscore[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_ivf_assignment_total(spark):
    """Every vector lands in exactly one inverted list; centroids are
    assigned to themselves (cosine(c, c) = 1 is maximal)."""
    emb = load_table(spark, SF_CHECK, "embeddings")
    n = emb.count()
    assign = similarity.ivf_assignments(emb, k=8)
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n
    self_rows = assign.filter(F.col("vec_id") < 8).collect()
    assert all(r.centroid_id == r.vec_id for r in self_rows)


def test_ivf_kmeans_refinement_runs(spark):
    """The Lloyd-refined quantizer yields a full, valid top-k result
    (k rows per query, scores within [-1, 1])."""
    emb = load_table(spark, SF_CHECK, "embeddings")
    rows = similarity.ivf_topk(
        emb, QUERY_IDS, k=3, n_centroids=16, nprobe=8, refine=True
    ).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert -1.0 <= r.cosine <= 1.0
    assert set(per_q) == set(QUERY_IDS)
    assert all(len(v) == 3 for v in per_q.values())


def test_ivf_topk_recall(spark):
    emb = load_table(spark, SF_CHECK, "embeddings")
    brute = similarity.knn_bruteforce(emb, QUERY_IDS, k=3).collect()
    approx = similarity.ivf_topk(emb, QUERY_IDS, k=3, n_centroids=16, nprobe=8).collect()
    bset = {(r.query_id, r.vec_id) for r in brute}
    aset = {(r.query_id, r.vec_id) for r in approx}
    recall = len(bset & aset) / len(bset)
    # probing half the lists on near-orthogonal vectors: expect a
    # majority of true neighbors back (they concentrate in the probed
    # lists only to the extent the coarse quantizer separates space)
    assert recall >= 0.5, f"recall {recall}"
    bscore = {(r.query_id, r.vec_id): r.cosine for r in brute}
    for r in approx:
        if (r.query_id, r.vec_id) in bscore:
            assert abs(bscore[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_semantic_dedup_sound_and_complete_within_clusters(spark):
    """Every dropped vector has a genuine >=threshold global near-pair
    (soundness: the within-cluster cosine is exact, so flagged pairs
    are a SUBSET of the exact all-pairs tier), and within a cluster
    the flags are exactly the earlier-mate-within-threshold rule."""
    emb = load_table(spark, SF_CHECK, "embeddings")
    thr = similarity.SEMDEDUP_THRESHOLD
    sd = {r.vec_id: r for r in similarity.semantic_dedup(emb, thr).collect()}
    assert len(sd) == emb.count()

    exact = similarity.cosine_near_pairs(emb, thr).collect()
    exact_partners = {}
    for r in exact:
        exact_partners.setdefault(r.vec_b, set()).add(r.vec_a)

    assign = {
        r.vec_id: r.centroid_id
        for r in similarity.ivf_assignments(emb).collect()
    }
    dropped = [v for v, r in sd.items() if not r.sd_keep]
    assert dropped, "fixture should contain at least one semantic dup"
    for v in dropped:
        # an earlier global near-partner exists in the same cluster
        partners = exact_partners.get(v, set())
        assert any(assign[p] == assign[v] for p in partners), v
    # completeness within clusters: any vec with an earlier near
    # partner in its own cluster must be dropped
    for v, partners in exact_partners.items():
        if any(assign[p] == assign[v] for p in partners):
            assert not sd[v].sd_keep, v


def test_pq_topk_recall_and_codes(spark):
    emb = load_table(spark, SF_CHECK, "embeddings")
    brute = similarity.knn_bruteforce(emb, QUERY_IDS, k=3).collect()
    approx = similarity.pq_topk(emb, QUERY_IDS, k=3).collect()
    bset = {(r.query_id, r.vec_id) for r in brute}
    aset = {(r.query_id, r.vec_id) for r in approx}
    recall = len(bset & aset) / len(bset)
    # ADC shortlist + exact re-rank on the 10-query set; the gate
    # bound is 0.6, measured headroom is asserted tighter here
    assert recall >= 0.7, f"recall {recall}"
    # re-ranked scores are exact: any pair also in brute agrees
    bscore = {(r.query_id, r.vec_id): r.cosine for r in brute}
    for r in approx:
        if (r.query_id, r.vec_id) in bscore:
            assert r.cosine == bscore[(r.query_id, r.vec_id)]
    # codes: one row per vector, every code within the codebook range
    books = similarity.pq_codebooks(emb)
    codes = similarity.pq_encode(emb, books)
    n = emb.count()
    assert codes.count() == n
    rng = codes.select(
        F.min(F.array_min("pq_codes")).alias("lo"),
        F.max(F.array_max("pq_codes")).alias("hi"),
        F.min(F.size("pq_codes")).alias("m_lo"),
        F.max(F.size("pq_codes")).alias("m_hi"),
    ).first()
    assert rng.lo >= 0 and rng.hi < similarity.PQ_KSUB
    assert rng.m_lo == rng.m_hi == similarity.PQ_M


def test_semdedup_k_clamp_matches_sql():
    """The Python-side semdedup_k and the oracle's integer-clamp SQL
    (least/greatest/// in _scaled_assign_sql) must derive the SAME k
    for every corpus size — integer-only math, so exact equality."""
    import duckdb

    for n in [0, 1, 500, 3_199, 3_200, 20_000, 6_553_600, 10_000_000]:
        sql_k = duckdb.sql(
            f"select cast(least(greatest({similarity.IVF_K}, "
            f"{n} // {similarity.SEMDEDUP_ROWS_PER_CLUSTER}), "
            f"{similarity.SEMDEDUP_MAX_K}) as bigint)"
        ).fetchone()[0]
        assert sql_k == similarity.semdedup_k(n), n


def test_ivf_index_persisted_parity(spark):
    """The persisted IVF index (write once, partition-pruned probes)
    returns bit-identical results to the live ivf_topk for the same
    quantizer, and its probe scan reads only the probed centroid
    directories."""
    import os
    import shutil

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "ivf_index",
    )
    shutil.rmtree(base, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_ivf_index(emb, base, n_centroids=8)

    # hive layout on disk: one directory per NON-EMPTY inverted list
    # (the refined quantizer may leave a centroid memberless)
    dirs = [d for d in os.listdir(os.path.join(base, "lists")) if d.startswith("centroid_id=")]
    assert 0 < len(dirs) <= 8

    qids = QUERY_IDS[:5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    # refine=True on BOTH sides: the build default is the refined
    # quantizer (round 8) and kmeans_centroids is deterministic, so
    # live and indexed train the identical quantizer
    live = similarity.ivf_topk(emb, qids, k=3, n_centroids=8, refine=True).collect()
    idx_df = similarity.ivf_topk_indexed(spark, base, queries, k=3)
    indexed = idx_df.collect()
    key = lambda r: (r.query_id, r.rk)
    assert sorted(map(tuple, live)) == sorted(map(tuple, indexed))

    # partition pruning is real: the probe predicate reaches the list
    # scan's partition index (and the pruned lists DataFrame itself
    # reads strictly fewer than all 8 directories)
    plan = idx_df._jdf.queryExecution().explainString(
        idx_df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and any("centroid_id" in ln for ln in pf)
    pruned = spark.read.parquet(os.path.join(base, "lists")).filter(
        F.col("centroid_id").isin([0, 1])
    )
    files = {
        r[0].split("centroid_id=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert files and files <= {"0", "1"}
    shutil.rmtree(base, ignore_errors=True)


def test_pq_index_persisted_parity(spark):
    """The persisted PQ index (codebooks + code table on disk)
    returns bit-identical results to the live pq_topk: distance
    tables rebuilt from stored codebooks, ADC scan over the stored
    codes, identical shortlist pruning and re-rank tie-breaks."""
    import os
    import shutil

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "pq_index",
    )
    shutil.rmtree(base, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_pq_index(emb, base)

    # the code table is the compressed corpus: one row per vector
    # (append_id is the hive batch-partition column, base build = 0)
    codes = spark.read.parquet(os.path.join(base, "codes"))
    assert codes.count() == emb.count()
    assert codes.columns == ["vec_id", "pq_codes", "append_id"]
    assert codes.select("append_id").distinct().collect()[0][0] == 0

    qids = QUERY_IDS[:5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    live = similarity.pq_topk(emb, qids, k=3).collect()
    indexed = similarity.pq_topk_indexed(spark, base, queries, emb, k=3).collect()
    assert sorted(map(tuple, live)) == sorted(map(tuple, indexed))
    shutil.rmtree(base, ignore_errors=True)


def test_indexed_external_namespace_no_self_exclusion(spark):
    """With exclude_query_ids=False (external query-id namespace), a
    corpus vector whose vec_id collides with a query id is NOT
    dropped: querying with a corpus member's own vector returns that
    very vector at rank 1 with cosine 1.0."""
    import os
    import shutil

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "ivf_index_ext",
    )
    shutil.rmtree(base, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_ivf_index(emb, base, n_centroids=8)
    r = emb.filter(F.col("vec_id") == 3).collect()[0]
    queries = [(3, list(r["embedding"]))]  # id collides with corpus
    rows = similarity.ivf_topk_indexed(
        spark, base, queries, k=3, exclude_query_ids=False
    ).collect()
    top = min(rows, key=lambda x: x.rk)
    assert (top.vec_id, top.cosine, top.rk) == (3, 1.0, 1)
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.slow
def test_index_append_daily_loop(spark):
    """The serving tier's daily loop (append_ivf_index /
    append_pq_index): appending a new embedding batch to a persisted
    index under the STORED quantizer/codebooks yields query results
    identical to a one-shot rebuild over base+batch with that same
    quantizer, and a replayed append (same append_id) changes
    nothing — idempotent by (append_id) layout."""
    import os
    import shutil

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
    )
    paths = {n: os.path.join(scratch, f"append_{n}") for n in
             ("ivf_a", "ivf_b", "pq_a", "pq_b")}
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    base_df = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(QUERY_IDS[:4])).collect()
    ]

    # IVF: base build + append  ==  rebuild over all, same quantizer
    similarity.write_ivf_index(base_df, paths["ivf_a"], n_centroids=8)
    similarity.append_ivf_index(batch, paths["ivf_a"], append_id=1)
    cq = similarity._stored_centroids(spark, paths["ivf_a"])
    similarity.write_ivf_index(emb, paths["ivf_b"], centroids=cq)
    got = similarity.ivf_topk_indexed(spark, paths["ivf_a"], queries, k=3)
    want = similarity.ivf_topk_indexed(spark, paths["ivf_b"], queries, k=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the batch landed as its own append_id partitions under the lists
    lists_dir = os.path.join(paths["ivf_a"], "lists")
    appended = [
        d for c in os.listdir(lists_dir) if c.startswith("centroid_id=")
        for d in os.listdir(os.path.join(lists_dir, c)) if d == "append_id=1"
    ]
    assert appended
    # replay: same batch, same append_id — results identical
    similarity.append_ivf_index(batch, paths["ivf_a"], append_id=1)
    replayed = similarity.ivf_topk_indexed(spark, paths["ivf_a"], queries, k=3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, replayed.collect())
    )

    # PQ: same contract with stored codebooks
    similarity.write_pq_index(base_df, paths["pq_a"])
    similarity.append_pq_index(batch, paths["pq_a"], append_id=1)
    books = similarity._stored_codebooks(spark, paths["pq_a"])
    similarity.write_pq_index(emb, paths["pq_b"], codebooks=books)
    got_pq = similarity.pq_topk_indexed(spark, paths["pq_a"], queries, emb, k=3)
    want_pq = similarity.pq_topk_indexed(spark, paths["pq_b"], queries, emb, k=3)
    assert sorted(map(tuple, got_pq.collect())) == sorted(
        map(tuple, want_pq.collect())
    )
    similarity.append_pq_index(batch, paths["pq_a"], append_id=1)
    again = similarity.pq_topk_indexed(spark, paths["pq_a"], queries, emb, k=3)
    assert sorted(map(tuple, got_pq.collect())) == sorted(map(tuple, again.collect()))

    # the base build owns append_id 0 and appends must not claim it
    import pytest

    with pytest.raises(ValueError):
        similarity.append_ivf_index(batch, paths["ivf_a"], append_id=0)
    with pytest.raises(ValueError):
        similarity.append_pq_index(batch, paths["pq_a"], append_id=0)

    # a REBUILD truncates prior appends even when the session default
    # is dynamic overwrite (the build writes pin static explicitly) —
    # otherwise stale append partitions would survive next to the
    # fresh quantizer's lists and silently duplicate vectors
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "dynamic")
    try:
        similarity.write_ivf_index(emb, paths["ivf_a"], n_centroids=8)
        leftover = [
            d for c in os.listdir(lists_dir) if c.startswith("centroid_id=")
            for d in os.listdir(os.path.join(lists_dir, c))
            if d == "append_id=1"
        ]
        assert not leftover
        similarity.write_pq_index(emb, paths["pq_a"])
        codes_dir = os.path.join(paths["pq_a"], "codes")
        assert "append_id=1" not in os.listdir(codes_dir)
    finally:
        spark.conf.set(conf_key, prev)
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)


def _hot_cluster_fixture(spark, n=1200, k=16, dim=8, seed=7):
    """Pathological embedding table: the coarse quantizer is the
    first ``k`` vectors by vec_id, so vec 0 is planted as the ONE
    hot direction, vecs 1..k-1 are spread, and half of the remaining
    corpus packs tightly around vec 0's direction — one coarse cell
    swallows ~half the corpus. Deterministic (seeded)."""
    import random

    rng = random.Random(seed)
    hot = [1.0] + [0.0] * (dim - 1)
    rows = []
    for i in range(n):
        if i == 0:
            v = hot
        elif i < k or i % 2 == 1:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        else:
            v = [x + rng.uniform(-0.01, 0.01) for x in hot]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_hot_cluster_blocked_join(spark):
    """Hot-cluster skew hardening: with half the corpus in one coarse
    cell, the within-cluster join must (a) return EXACTLY the same
    flags as the semantics demand, and (b) split the hot cluster's
    pair work over many (centroid_id, _blk) keys with per-key
    candidate counts bounded by ~cluster_size x SEMDEDUP_BLOCK_ROWS —
    never the single m^2/2 task the unblocked join would produce."""
    from pyspark.sql import functions as F

    emb = _hot_cluster_fixture(spark).cache()
    try:
        k = 16
        got = {
            r.vec_id: (r.sd_max_prior_sim, r.sd_keep)
            for r in similarity.semantic_dedup(emb, k=k).collect()
        }
        # independent recompute: assignments + per-cluster numpy max
        import numpy as np

        assign = {
            r.vec_id: r.centroid_id
            for r in similarity.ivf_assignments(emb, k).collect()
        }
        vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
        want_prior = {}
        by_cluster: dict[int, list[int]] = {}
        for vid in sorted(vecs):
            by_cluster.setdefault(assign[vid], []).append(vid)
        for members in by_cluster.values():
            for j, b in enumerate(members):
                best = 0.0
                for a in members[:j]:
                    va, vb = vecs[a], vecs[b]
                    cos = float(
                        va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                    )
                    best = max(best, round(cos, 6))
                want_prior[b] = best
        assert set(got) == set(vecs)
        for vid, (sim, keep) in got.items():
            assert abs(sim - want_prior.get(vid, 0.0)) < 2e-6, vid
            assert keep == (want_prior.get(vid, 0.0) < similarity.SEMDEDUP_THRESHOLD)

        # structural: the hot cluster fans out over multiple block keys,
        # and no single key carries more than size x BLOCK_ROWS pairs
        sides = emb.select("vec_id", "embedding").join(
            similarity.ivf_assignments(emb, k), "vec_id"
        )
        per_key = (
            similarity._semdedup_candidates(sides)
            .groupBy("centroid_id", "_blk")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .collect()
        )
        csizes = {
            r.centroid_id: r.cnt
            for r in sides.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        hot_cid, hot_size = max(csizes.items(), key=lambda kv: kv[1])
        assert hot_size >= 500  # the fixture really is pathological
        hot_keys = [r for r in per_key if r.centroid_id == hot_cid]
        assert len(hot_keys) >= hot_size // similarity.SEMDEDUP_BLOCK_ROWS
        bound = hot_size * similarity.SEMDEDUP_BLOCK_ROWS
        assert all(r.n_pairs <= bound for r in hot_keys)
        # the unblocked join would put ALL hot pairs in one key
        assert max(r.n_pairs for r in hot_keys) < hot_size * (hot_size - 1) // 2
        # completeness of the decomposition: total pairs conserved
        total = sum(r.n_pairs for r in per_key)
        assert total == sum(m * (m - 1) // 2 for m in csizes.values())
    finally:
        emb.unpersist()


def _h64(seed: str, s: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def _bounded_spec(vecs, assign, cap, threshold):
    """Numpy mirror of the BOUNDED hot-cell SemDeDup semantics
    (operators/similarity._semdedup_candidates_bounded): sub-quantize
    via s min-by-seeded-hash draws, hash-block over-cap sub-cells,
    cell+sub anchor pairs; exact-cell semantics for cells <= cap.
    Returns {vec_id: max_prior_sim} over the candidate pair set,
    using the engine's sequential cosine fold (_seq_cosines)."""
    import math

    import numpy as np

    def cos(a, b):
        return float(
            similarity._seq_cosines(a[None, :], b[None, :])[0, 0]
        )

    by_cell: dict[int, list[int]] = {}
    for vid in sorted(vecs):
        by_cell.setdefault(assign[vid], []).append(vid)
    prior: dict[int, float] = {}

    def feed(a, b):
        if a > b:
            a, b = b, a
        if a == b:
            return
        c = cos(np.array(vecs[a]), np.array(vecs[b]))
        if b not in prior or c > prior[b]:
            prior[b] = c

    for members in by_cell.values():
        m = len(members)
        if m <= cap:
            for j, b in enumerate(members):
                for a in members[:j]:
                    feed(a, b)
            continue
        s = min(max(math.ceil(m / cap), 2), similarity.SEMDEDUP_SUBQ_MAX)
        draws = []
        for j in range(s):
            hs = [(_h64(f"sdsub{j}", str(v)), v) for v in members]
            assert len({h for h, _ in hs}) == len(hs), "hash tie in fixture"
            draws.append(min(hs)[1])
        subs = [np.array(vecs[d]) for d in draws]
        sub_of = {}
        for v in members:
            best_c, best_j = -2.0, -1
            for j, sc in enumerate(subs):
                c = cos(np.array(vecs[v]), sc)
                if c > best_c:
                    best_c, best_j = c, j
            sub_of[v] = best_j
        by_sub: dict[int, list[int]] = {}
        for v in members:
            by_sub.setdefault(sub_of[v], []).append(v)
        for sub_members in by_sub.values():
            nb = max(1, math.ceil(len(sub_members) / cap))
            by_blk: dict[int, list[int]] = {}
            for v in sub_members:
                by_blk.setdefault(_h64("sdblk", str(v)) % nb, []).append(v)
            for blk_members in by_blk.values():
                for j, b in enumerate(blk_members):
                    for a in blk_members[:j]:
                        feed(a, b)
            sa = min(sub_members)
            for v in sub_members:
                feed(sa, v)
        ca = min(members)
        for v in members:
            feed(ca, v)
    return prior


@pytest.mark.slow
def test_semdedup_bounded_cell_matches_spec(spark):
    """The hot-cell bounded scheme must implement EXACTLY its spec
    (sub-quantize draws, hash blocks, anchors) — engine vs the numpy
    mirror, per-vector equality of sd_max_prior_sim and sd_keep —
    and stay SOUND vs the exact form (bounded candidates are a
    subset, so its keep set is a superset of exact's)."""
    cap = 100
    emb = _hot_cluster_fixture(spark).cache()
    try:
        k = 16
        got = {
            r.vec_id: (r.sd_max_prior_sim, r.sd_keep)
            for r in similarity.semantic_dedup(emb, k=k, cell_cap=cap).collect()
        }
        assign = {
            r.vec_id: r.centroid_id
            for r in similarity.ivf_assignments(emb, k).collect()
        }
        vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
        want = _bounded_spec(vecs, assign, cap, similarity.SEMDEDUP_THRESHOLD)
        assert set(got) == set(vecs)
        for vid, (sim, keep) in got.items():
            w = round(want.get(vid, 0.0), 6)
            assert abs(sim - w) < 2e-6, (vid, sim, w)
            assert keep == (
                want.get(vid, 0.0) < similarity.SEMDEDUP_THRESHOLD
            ), vid
        # soundness vs exact: bounded never drops a vector exact keeps
        exact_keep = {
            r.vec_id
            for r in similarity.semantic_dedup(
                emb, k=k, cell_cap=10**9
            ).collect()
            if r.sd_keep
        }
        bounded_keep = {v for v, (_, kp) in got.items() if kp}
        assert exact_keep <= bounded_keep
    finally:
        emb.unpersist()


def test_semdedup_bounded_total_pairs_linear(spark):
    """Work bound: the bounded candidate set for a hot cell of size m
    is O(m·cap) pairs — never the m²/2 of the exact form."""
    cap = 100
    emb = _hot_cluster_fixture(spark).cache()
    try:
        k = 16
        sides = emb.select("vec_id", "embedding").join(
            similarity.ivf_assignments(emb, k), "vec_id"
        )
        sizes = {
            r.centroid_id: r.cnt
            for r in sides.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        hot = [c for c, m in sizes.items() if m > cap]
        assert hot, "fixture must have a hot cell"
        sides_hot = sides.filter(F.col("centroid_id").isin(hot))
        n_pairs = similarity._semdedup_candidates_bounded(sides_hot, cap).count()
        m_tot = sum(sizes[c] for c in hot)
        # hash-block variance bound: ~1.5x the nominal m*cap/2 + 2m
        assert n_pairs <= int(1.5 * (m_tot * cap / 2 + 2 * m_tot)), (
            n_pairs,
            m_tot,
        )
        worst_exact = max(sizes[c] for c in hot)
        assert n_pairs < worst_exact * (worst_exact - 1) // 2
    finally:
        emb.unpersist()


@pytest.mark.slow
def test_index_change_feed_fold(spark):
    """Tombstoned delete/update for the persisted indexes
    (apply_changes_to_ivf_index / apply_changes_to_pq_index): folding
    a Delta-CDF-vocabulary change batch (deletes, update pre+post
    pairs, inserts) into a persisted index makes probes see EXACTLY
    the post-change corpus — pinned against a same-quantizer rebuild
    from that corpus. Also: replay idempotence, generation scoping
    (delete then re-insert in a later batch revives the id), and
    rebuilds clearing the tombstone line."""
    import os
    import shutil

    import pytest

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
    )
    paths = {n: os.path.join(scratch, f"cf_{n}") for n in
             ("ivf_a", "ivf_b", "pq_a", "pq_b")}
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 7 != 6)

    # the change batch: deletes (%11==0), updates (%13==1 → reversed
    # vector, same id), inserts (the held-out %7==6 slice)
    is_del = (F.col("vec_id") % 11 == 0) & (F.col("vec_id") % 13 != 1)
    is_upd = F.col("vec_id") % 13 == 1
    deletes = base.filter(is_del).withColumn("_change_type", F.lit("delete"))
    upd_pre = base.filter(is_upd).withColumn(
        "_change_type", F.lit("update_preimage")
    )
    upd_post = (
        base.filter(is_upd)
        .withColumn("embedding", F.reverse("embedding"))
        .withColumn("_change_type", F.lit("update_postimage"))
    )
    inserts = emb.filter(F.col("vec_id") % 7 == 6).withColumn(
        "_change_type", F.lit("insert")
    )
    changes = (
        deletes.unionByName(upd_pre).unionByName(upd_post).unionByName(inserts)
        .localCheckpoint()
    )
    # what the corpus looks like after the batch
    post_corpus = (
        base.filter(~is_del & ~is_upd)
        .unionByName(base.filter(is_upd).withColumn("embedding", F.reverse("embedding")))
        .unionByName(emb.filter(F.col("vec_id") % 7 == 6))
        .localCheckpoint()
    )
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(QUERY_IDS[:4])).collect()
    ]

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # IVF: fold == same-quantizer rebuild over the post corpus
    similarity.write_ivf_index(base, paths["ivf_a"], n_centroids=8)
    similarity.apply_changes_to_ivf_index(
        spark, paths["ivf_a"], changes, append_id=1
    )
    cq = similarity._stored_centroids(spark, paths["ivf_a"])
    similarity.write_ivf_index(post_corpus, paths["ivf_b"], centroids=cq)
    got = similarity.ivf_topk_indexed(spark, paths["ivf_a"], queries, k=3)
    want = similarity.ivf_topk_indexed(spark, paths["ivf_b"], queries, k=3)
    assert rows(got) == rows(want)
    # deleted ids never surface, even scanning EVERY list (nprobe=all)
    # with k covering the whole corpus
    deep = similarity.ivf_topk_indexed(
        spark, paths["ivf_a"], queries, k=10_000, nprobe=8
    )
    dead_ids = {r.vec_id for r in deletes.collect()}
    assert not ({r.vec_id for r in deep.collect()} & dead_ids)
    # replay: identical
    similarity.apply_changes_to_ivf_index(
        spark, paths["ivf_a"], changes, append_id=1
    )
    assert rows(similarity.ivf_topk_indexed(spark, paths["ivf_a"], queries, k=3)) == rows(got)
    # generation scoping: a later batch re-inserts one deleted id —
    # the new copy survives the old tombstone
    revive_id = min(dead_ids)
    revive = (
        base.filter(F.col("vec_id") == revive_id)
        .withColumn("_change_type", F.lit("insert"))
    )
    similarity.apply_changes_to_ivf_index(
        spark, paths["ivf_a"], revive, append_id=2
    )
    deep2 = similarity.ivf_topk_indexed(
        spark, paths["ivf_a"], queries, k=10_000, nprobe=8,
        exclude_query_ids=False,
    )
    per_query = [r.vec_id for r in deep2.collect() if r.query_id == queries[0][0]]
    assert revive_id in {r.vec_id for r in deep2.collect()}
    # and exactly ONCE per query: the old tombstone kills only the old
    # generation's copy, never duplicates the revived one
    assert per_query.count(revive_id) == 1

    # PQ: same contract through the stored codebooks
    similarity.write_pq_index(base, paths["pq_a"])
    similarity.apply_changes_to_pq_index(
        spark, paths["pq_a"], changes, append_id=1
    )
    books = similarity._stored_codebooks(spark, paths["pq_a"])
    similarity.write_pq_index(post_corpus, paths["pq_b"], codebooks=books)
    got_pq = similarity.pq_topk_indexed(
        spark, paths["pq_a"], queries, post_corpus, k=3
    )
    want_pq = similarity.pq_topk_indexed(
        spark, paths["pq_b"], queries, post_corpus, k=3
    )
    assert rows(got_pq) == rows(want_pq)
    similarity.apply_changes_to_pq_index(
        spark, paths["pq_a"], changes, append_id=1
    )
    assert rows(
        similarity.pq_topk_indexed(spark, paths["pq_a"], queries, post_corpus, k=3)
    ) == rows(got_pq)

    # a REBUILD clears the tombstone line (else stale tombstones would
    # kill the fresh base's append_id=0 rows)
    assert os.path.isdir(os.path.join(paths["ivf_a"], "lists", "_tombstones"))
    similarity.write_ivf_index(emb, paths["ivf_a"], n_centroids=8)
    assert not os.path.isdir(os.path.join(paths["ivf_a"], "lists", "_tombstones"))
    full = similarity.ivf_topk_indexed(
        spark, paths["ivf_a"], queries, k=10_000, nprobe=8,
        exclude_query_ids=False,
    )
    assert {r.vec_id for r in full.collect()} >= dead_ids

    # tombstone batches must not claim the base generation
    with pytest.raises(ValueError):
        similarity.tombstone_index(spark, paths["pq_a"], [1, 2], append_id=0)
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)


@pytest.mark.slow
def test_index_compaction_purges_tombstones(spark):
    """compact_ivf_index / compact_pq_index: after change-feed folds,
    compaction physically removes tombstoned rows and drops the
    tombstone set, with probes bit-identical before and after (the
    layout-preserving rewrite keeps every row's generation, so even
    STALE tombstones stay correct — no crash window can mis-serve).
    Also pins every recover_index_compaction residue state."""
    import os
    import shutil

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "cmp_idx",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    ivf, pq = os.path.join(scratch, "ivf"), os.path.join(scratch, "pq")
    emb = load_table(spark, SF_CHECK, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 3 != 2)
    batch = emb.filter(F.col("vec_id") % 3 == 2)
    deletes = (
        base.filter(F.col("vec_id") % 11 == 0)
        .withColumn("_change_type", F.lit("delete"))
    )
    changes = deletes.unionByName(
        batch.withColumn("_change_type", F.lit("insert"))
    ).localCheckpoint()
    dead_ids = {r.vec_id for r in deletes.collect()}
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin([1, 4, 7])).collect()
    ]

    def rows(df):
        return sorted(map(tuple, df.collect()))

    similarity.write_ivf_index(base, ivf, n_centroids=8)
    similarity.apply_changes_to_ivf_index(spark, ivf, changes, append_id=1)
    similarity.write_pq_index(base, pq)
    similarity.apply_changes_to_pq_index(spark, pq, changes, append_id=1)

    before_ivf = rows(similarity.ivf_topk_indexed(spark, ivf, queries, k=3))
    before_pq = rows(similarity.pq_topk_indexed(spark, pq, queries, emb, k=3))

    similarity.compact_ivf_index(spark, ivf)
    similarity.compact_pq_index(spark, pq)
    assert not os.path.exists(os.path.join(ivf, "lists", "_tombstones"))
    assert not os.path.exists(os.path.join(pq, "codes", "_tombstones"))
    # every generation folded back into the base layout
    gens = {
        d for root_, dirs, _ in os.walk(os.path.join(ivf, "lists"))
        for d in dirs if d.startswith("append_id=")
    }
    assert gens == {"append_id=0"}, gens
    assert sorted(
        d for d in os.listdir(os.path.join(pq, "codes"))
        if d.startswith("append_id=")
    ) == ["append_id=0"]
    assert rows(similarity.ivf_topk_indexed(spark, ivf, queries, k=3)) == before_ivf
    assert rows(similarity.pq_topk_indexed(spark, pq, queries, emb, k=3)) == before_pq
    # deleted rows are physically gone: a full-depth scan of every
    # list never surfaces them even with no tombstone filter left
    deep = similarity.ivf_topk_indexed(spark, ivf, queries, k=10_000, nprobe=8)
    assert not ({r.vec_id for r in deep.collect()} & dead_ids)

    # crash residues. (a) partial rewrite, no rename yet → discarded
    shutil.copytree(os.path.join(ivf, "lists"), os.path.join(ivf, "lists.compact"))
    assert "discarded" in similarity.recover_index_compaction(spark, ivf, "lists")
    assert not os.path.exists(os.path.join(ivf, "lists.compact"))
    # (b) between the renames: live missing, old + compact present
    shutil.copytree(os.path.join(ivf, "lists"), os.path.join(ivf, "lists.compact"))
    os.rename(os.path.join(ivf, "lists"), os.path.join(ivf, "lists.old"))
    assert "finished swap" in similarity.recover_index_compaction(spark, ivf, "lists")
    assert rows(similarity.ivf_topk_indexed(spark, ivf, queries, k=3)) == before_ivf
    # (c) before cleanup: live + old both present
    shutil.copytree(os.path.join(ivf, "lists"), os.path.join(ivf, "lists.old"))
    assert "cleanup" in similarity.recover_index_compaction(spark, ivf, "lists")
    assert not os.path.exists(os.path.join(ivf, "lists.old"))
    assert rows(similarity.ivf_topk_indexed(spark, ivf, queries, k=3)) == before_ivf
    # idempotent on a clean index
    assert similarity.recover_index_compaction(spark, ivf, "lists") == "clean"
    shutil.rmtree(scratch, ignore_errors=True)


# ------------------------------------------------------------- round 7:
# the IVF-PQ hybrid — partition-pruned lists of 16-byte codes.


def _scratch(name: str) -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        name,
    )


@pytest.mark.slow
def test_ivfpq_all_probe_equals_flat_pq(spark):
    """THE hybrid equality pin: probing ALL lists scans exactly the
    whole code table, so ivfpq_topk_indexed(nprobe=n_centroids) must
    be bit-identical to pq_topk_indexed on the same codebooks — the
    pruning is auditably lossless except for the nprobe knob."""
    import shutil

    hyb, flat = _scratch("ivfpq_eq"), _scratch("ivfpq_eq_flat")
    shutil.rmtree(hyb, ignore_errors=True)
    shutil.rmtree(flat, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    books = similarity.pq_codebooks(emb)
    similarity.write_ivfpq_index(emb, hyb, n_centroids=8, codebooks=books)
    similarity.write_pq_index(emb, flat, codebooks=books)
    qids = QUERY_IDS[:5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    hybrid = similarity.ivfpq_topk_indexed(
        spark, hyb, queries, emb, k=3, nprobe=8
    ).collect()
    flatpq = similarity.pq_topk_indexed(spark, flat, queries, emb, k=3).collect()
    assert sorted(map(tuple, hybrid)) == sorted(map(tuple, flatpq))
    shutil.rmtree(hyb, ignore_errors=True)
    shutil.rmtree(flat, ignore_errors=True)


@pytest.mark.slow
def test_ivfpq_partition_pruning_and_recall(spark):
    """Default-nprobe serve: the list scan partition-prunes on
    centroid_id (the 100 TB point of the hybrid) and recall@3 against
    brute force clears the PQ-family floor."""
    import os
    import shutil

    base = _scratch("ivfpq_idx")
    shutil.rmtree(base, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_ivfpq_index(emb, base, n_centroids=8)
    # layout: one directory per inverted list, payload is codes only
    lists = spark.read.parquet(os.path.join(base, "lists"))
    assert sorted(lists.columns) == [
        "append_id", "centroid_id", "pq_codes", "vec_id",
    ]
    assert lists.count() == emb.count()
    qids = QUERY_IDS[:5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    idx_df = similarity.ivfpq_topk_indexed(spark, base, queries, emb, k=3)
    plan = idx_df._jdf.queryExecution().explainString(
        idx_df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and any("centroid_id" in ln for ln in pf)
    got = {(r.query_id, r.vec_id) for r in idx_df.collect()}
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.knn_bruteforce(emb, qids, 3).collect()
    }
    assert len(got & exact) / len(exact) >= 0.8
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.slow
def test_ivfpq_append_and_fold_loop(spark):
    """The daily loop for the hybrid: base build on 4/5 of the corpus,
    held-out 1/5 appended under the STORED quantizer+codebooks —
    query-equal to a same-artifact one-shot rebuild, replay-idempotent;
    then a change-feed fold whose phantom deletes must actually die
    (tombstones) and whose inserts must serve."""
    import shutil

    base, reb = _scratch("ivfpq_app"), _scratch("ivfpq_reb")
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(reb, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    older = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    cids_cmat = similarity._centroids(older, 8)
    books = similarity.pq_codebooks(older)
    similarity.write_ivfpq_index(
        older, base, n_centroids=8, centroids=cids_cmat, codebooks=books
    )
    similarity.append_ivfpq_index(batch.select("vec_id", "embedding"), base, 1)
    # replay: same append_id overwrites its own partitions, no dupes
    similarity.append_ivfpq_index(batch.select("vec_id", "embedding"), base, 1)
    similarity.write_ivfpq_index(
        emb, reb, n_centroids=8, centroids=cids_cmat, codebooks=books
    )
    qids = QUERY_IDS[:5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    appended = similarity.ivfpq_topk_indexed(spark, base, queries, emb, k=3)
    rebuilt = similarity.ivfpq_topk_indexed(spark, reb, queries, emb, k=3)
    assert sorted(map(tuple, appended.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # fold: delete two corpus vectors + insert two far-out phantoms;
    # after the fold the dead ids never serve and the new ids can
    victims = [r.vec_id for r in rebuilt.filter(F.col("rk") == 1).collect()][:2]
    new_rows = spark.createDataFrame(
        [
            (8_000_000 + i, list(q))
            for i, (_, q) in enumerate(queries[:2])
        ],
        emb.select("vec_id", "embedding").schema,
    )
    changes = (
        emb.filter(F.col("vec_id").isin(victims))
        .select("vec_id", "embedding")
        .withColumn("_change_type", F.lit("delete"))
        .unionByName(new_rows.withColumn("_change_type", F.lit("insert")))
    )
    similarity.apply_changes_to_ivfpq_index(spark, base, changes, 2)
    served = similarity.ivfpq_topk_indexed(
        spark,
        base,
        queries,
        emb.select("vec_id", "embedding").unionByName(new_rows),
        k=3,
    ).collect()
    assert not ({r.vec_id for r in served} & set(victims))
    # a phantom copy of query 0's vector must now top query 0
    q0 = [r for r in served if r.query_id == queries[0][0] and r.rk == 1]
    assert q0 and q0[0].vec_id == 8_000_000 and q0[0].cosine == 1.0
    # compaction folds generations back to gen 0 and purges tombstones
    similarity.compact_ivfpq_index(spark, base)
    post = similarity.ivfpq_topk_indexed(
        spark,
        base,
        queries,
        emb.select("vec_id", "embedding").unionByName(new_rows),
        k=3,
    ).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, post))
    import os

    assert not os.path.exists(os.path.join(base, "lists", "_tombstones"))
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(reb, ignore_errors=True)

# ------------------------------------------------------------- round 8:
# residual (IVFADC) encoding mode + the Lloyd-refined build default.


def _clustered_fixture(spark, n=2000, n_clusters=12, dim=64, noise=0.15, seed=11):
    """Gaussian blobs on random centers — embeddings with REAL cluster
    structure (unlike the near-orthogonal word-soup corpus), where the
    coarse quantizer captures the cluster mean and the per-vector
    information lives in the small residual. Deterministic (seeded)."""
    import random

    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = [
        (
            i,
            [x + rng.gauss(0, noise) for x in centers[i % n_clusters]],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.slow
def test_ivfpq_residual_beats_flat_on_clustered(spark):
    """VERDICT r7 #5, measured at the claim's actual level. Jegou 2011
    SIII's statement is about CODE FIDELITY: encoding the residual to
    the assigned centroid spends the code budget on the within-cluster
    offset instead of re-encoding the cluster center every vector
    shares — so residual reconstruction error must be strictly below
    flat's on clustered data. Asserted directly (measured 1.9× lower
    MSE on this fixture), plus the downstream effect the serving path
    sees: recall@3 at a tight shortlist is strictly higher (0.54 vs
    0.42 at shortlist=4). Per-shortlist recall DOMINANCE everywhere is
    deliberately NOT asserted — at shortlist 1–2 on a 24-pair fixture
    one recall step is 0.04 and quantizer-geometry noise flips signs
    (the round-8 review's within-cluster snap fix did exactly that).
    Also pins the meta artifact round-trip (and its absence => flat,
    the pre-meta back-compat)."""
    import os
    import shutil

    import numpy as np

    emb = _clustered_fixture(spark).cache()
    # --- code-fidelity core: reconstruction MSE, residual < flat
    x = similarity._train_sample(emb, 100_000)
    cq = similarity.kmeans_centroids(emb, 16)
    scids, scmat = similarity._normalized_centroid_lookup(cq)
    pick = np.searchsorted(
        scids,
        similarity._argmax_lowest_id(
            similarity._cosines_fast(x, scmat), scids
        ),
    )

    def encode_decode(books, v):
        m, _, sub = books.shape
        rec = np.zeros_like(v)
        for b in range(m):
            blk = v[:, b * sub : (b + 1) * sub]
            d = ((blk[:, None, :] - books[b][None, :, :]) ** 2).sum(-1)
            rec[:, b * sub : (b + 1) * sub] = books[b][d.argmin(1)]
        return rec

    flat_books = similarity._lloyd_blocks(x, 16, 16, 5)
    res_books = similarity._lloyd_blocks(x - scmat[pick], 16, 16, 5)
    mse_flat = ((encode_decode(flat_books, x) - x) ** 2).sum(1).mean()
    rec_res = scmat[pick] + encode_decode(res_books, x - scmat[pick])
    mse_res = ((rec_res - x) ** 2).sum(1).mean()
    assert mse_res < 0.75 * mse_flat, (mse_res, mse_flat)

    # --- end-to-end: at a tight shortlist the finer codes surface as
    # strictly higher recall (exact re-rank can't rescue the ordering)
    qids = [0, 1, 2, 3, 4, 5, 6, 7]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.knn_bruteforce(emb, qids, 3).collect()
    }
    recalls = {}
    paths = {}
    for mode, residual in (("flat", False), ("residual", True)):
        p = _scratch(f"res_clustered_{mode}")
        paths[mode] = p
        shutil.rmtree(p, ignore_errors=True)
        similarity.write_ivfpq_index(emb, p, n_centroids=16, residual=residual)
        assert similarity._stored_ivfpq_residual(spark, p) is residual
        got = {
            (r.query_id, r.vec_id)
            for r in similarity.ivfpq_topk_indexed(
                spark, p, queries, emb, k=3, nprobe=4, shortlist=4
            ).collect()
        }
        recalls[mode] = len(got & exact) / len(exact)
    assert recalls["residual"] > recalls["flat"], recalls
    # back-compat: an index with NO meta artifact (pre-round-8 layout)
    # reads as flat
    shutil.rmtree(os.path.join(paths["flat"], "meta"))
    assert similarity._stored_ivfpq_residual(spark, paths["flat"]) is False
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)
    emb.unpersist()


@pytest.mark.slow
def test_ivfpq_residual_full_probe_full_shortlist_equals_flat(spark):
    """Plumbing equality: with EVERY list probed and a shortlist
    covering the whole corpus, the ADC ordering is irrelevant (all
    scanned rows reach the exact re-rank), so residual and flat modes
    must return bit-identical results - and both must equal exact
    brute force on (query_id, vec_id). Pins that the residual serve
    path (per-(query,list) tables, centroid-carrying candidates)
    loses no rows and breaks no ties."""
    import shutil

    emb = load_table(spark, SF_CHECK, "embeddings")
    n = emb.count()
    qids = QUERY_IDS[:5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    results = {}
    for mode, residual in (("flat", False), ("residual", True)):
        p = _scratch(f"res_fullprobe_{mode}")
        shutil.rmtree(p, ignore_errors=True)
        similarity.write_ivfpq_index(emb, p, n_centroids=8, residual=residual)
        results[mode] = sorted(
            map(
                tuple,
                similarity.ivfpq_topk_indexed(
                    spark, p, queries, emb, k=3, nprobe=8, shortlist=n
                ).collect(),
            )
        )
        shutil.rmtree(p, ignore_errors=True)
    assert results["flat"] == results["residual"]
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.knn_bruteforce(emb, qids, 3).collect()
    }
    assert {(r[0], r[1]) for r in results["residual"]} == exact


@pytest.mark.slow
def test_ivfpq_residual_append_respects_stored_mode(spark):
    """append_ivfpq_index on a RESIDUAL index encodes the batch in
    residual mode (read from meta, never passed by the caller): base
    residual build on 4/5 of the corpus + append of the held-out 1/5
    is query-equal to a one-shot residual rebuild with the same stored
    quantizer+codebooks. A mode mismatch (batch encoded flat into a
    residual index) would mis-rank appended vectors at tight
    shortlists - asserted by serving with shortlist=1."""
    import shutil

    base, reb = _scratch("res_app"), _scratch("res_reb")
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(reb, ignore_errors=True)
    emb = _clustered_fixture(spark, n=1000).cache()
    older = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    similarity.write_ivfpq_index(older, base, n_centroids=16, residual=True)
    similarity.append_ivfpq_index(batch, base, 1)
    cq = similarity._stored_centroids(spark, base)
    books = similarity._stored_codebooks(spark, base)
    similarity.write_ivfpq_index(
        emb, reb, centroids=cq, codebooks=books, residual=True
    )
    qids = [0, 4, 9, 14]  # 4, 9, 14 land in the appended fifth's orbit
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    for shortlist in (1, 8):
        got = similarity.ivfpq_topk_indexed(
            spark, base, queries, emb, k=3, shortlist=shortlist
        )
        want = similarity.ivfpq_topk_indexed(
            spark, reb, queries, emb, k=3, shortlist=shortlist
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(reb, ignore_errors=True)
    emb.unpersist()


@pytest.mark.slow
def test_zero_vector_does_not_poison_index(spark):
    """Round-8 hardening: a single all-zero embedding (deleted doc,
    failed encoder — realistic at 100 TB) must not corrupt the index.
    Before the _seq_cosines NaN->-inf fix, a zero vector among the
    first-k centroids made EVERY row's coarse assignment NaN-poisoned
    into the int64-max tie sentinel: one garbage list holding the
    whole corpus, every probe served empty, silently. Now: the
    degenerate vector loses every comparison deterministically, all
    other vectors assign normally, and the built index serves real
    neighbors."""
    import shutil

    base = _scratch("zero_vec_idx")
    shutil.rmtree(base, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(0, [0.0] * dim)], "vec_id long, embedding array<float>"
    )
    poisoned = emb.filter(F.col("vec_id") != 0).unionByName(
        zero.select("vec_id", F.col("embedding").cast(emb.schema["embedding"].dataType))
    )
    # vec 0 is all-zero AND (by vec_id order) a first-k centroid in
    # refine=False mode; cover BOTH quantizer paths
    for kw in (dict(refine=False), dict(refine=True)):
        shutil.rmtree(base, ignore_errors=True)
        similarity.write_ivfpq_index(poisoned, base, n_centroids=8, **kw)
        lists = spark.read.parquet(f"{base}/lists")
        assert lists.count() == poisoned.count()
        # no sentinel list; every centroid_id is a real quantizer id
        cids = {r[0] for r in lists.select("centroid_id").distinct().collect()}
        assert max(cids) < 2**62, cids
        qids = [r.vec_id for r in emb.filter(F.col("vec_id").isin(1, 2, 3)).collect()]
        queries = [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.filter(F.col("vec_id").isin(qids)).collect()
        ]
        got = similarity.ivfpq_topk_indexed(
            spark, base, queries, poisoned, k=3, nprobe=8
        ).collect()
        assert len(got) == 3 * len(queries)
    shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------
# ANN10: bucketed raw-vector store — shortlist-sized exact re-rank


@pytest.mark.slow
def test_vector_store_rerank_equality_and_bucket_pruning(spark):
    """Serving from the bucketed raw-vector store is bit-identical to
    serving from the live corpus frame for BOTH PQ-family serves, and
    the store scan is bucket-pruned by the shortlist's literal IN
    filter (SelectedBucketsCount < total — the 100 TB point: re-rank
    IO tracks the shortlist, never the corpus)."""
    import os
    import shutil

    import pytest

    store = _scratch("vs_store")
    flat, hyb = _scratch("vs_flat"), _scratch("vs_hyb")
    for d in (store, flat, hyb):
        shutil.rmtree(d, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    books = similarity.pq_codebooks(emb)
    similarity.write_pq_index(emb, flat, codebooks=books)
    similarity.write_ivfpq_index(emb, hyb, n_centroids=8, codebooks=books)
    # 128 buckets: the fixture's ~150 shortlist ids then cover a
    # strict subset, so the pruning is OBSERVABLE (at 32 buckets
    # they'd cover every directory and the assert would be vacuous;
    # production sizing scales buckets with the corpus while the
    # shortlist stays fixed, so coverage only shrinks)
    similarity.write_vector_store(emb, store, n_buckets=128)
    n_dirs = len(
        [d for d in os.listdir(f"{store}/rows") if d.startswith("bucket=")]
    )
    qids = QUERY_IDS[:5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    # residual-mode hybrid too: ANN9 × ANN10 composition — the store
    # re-rank is mode-agnostic (it only fetches raw vectors), so the
    # equality must hold under residual ADC ordering as well
    res = _scratch("vs_res")
    shutil.rmtree(res, ignore_errors=True)
    similarity.write_ivfpq_index(emb, res, n_centroids=8, residual=True)
    serves = (
        # strict=True: shortlist must touch a strict subset of dirs
        # (the residual hybrid's per-list tables shortlist differently
        # and legitimately cover every existing dir on this fixture —
        # its leg pins equality + the PartitionFilter only)
        (True, lambda **kw: similarity.pq_topk_indexed(
            spark, flat, queries, k=3, **kw
        )),
        (True, lambda **kw: similarity.ivfpq_topk_indexed(
            spark, hyb, queries, k=3, **kw
        )),
        (False, lambda **kw: similarity.ivfpq_topk_indexed(
            spark, res, queries, k=3, **kw
        )),
    )
    for strict, serve in serves:
        live = sorted(map(tuple, serve(emb=emb).collect()))
        stored_df = serve(vector_store=store)
        stored = sorted(map(tuple, stored_df.collect()))
        assert stored == live and stored
        # the store scan carries an explicit bucket PartitionFilter
        # and physically touches a strict subset of the directories
        plan = stored_df._jdf.queryExecution().executedPlan().toString()
        pf = [
            ln for ln in plan.splitlines()
            if "PartitionFilters:" in ln and "bucket" in ln
        ]
        assert pf, plan
        touched = {
            f.split("/bucket=")[1].split("/")[0]
            for f in stored_df.inputFiles()
            if "/bucket=" in f
        }
        assert 0 < len(touched) <= n_dirs, (len(touched), n_dirs)
        if strict:
            assert len(touched) < n_dirs, (len(touched), n_dirs)
    # exactly one re-rank source, validated before any job runs
    with pytest.raises(ValueError, match="exactly one"):
        similarity.pq_topk_indexed(
            spark, flat, queries, emb=emb, k=3, vector_store=store
        )
    with pytest.raises(ValueError, match="exactly one"):
        similarity.pq_topk_indexed(spark, flat, queries, k=3)
    for d in (store, flat, hyb, res):
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_vector_store_fold_replay_and_compact(spark):
    """The CF1 fold keeps the store serving the live corpus: an
    update's postimage replaces the doctored base vector, a delete
    drops out (NULL tombstone), an insert appears; a replayed fold
    (same gen) collapses; compaction nets the line to gen 0 with
    identical resolution; end-to-end, folded index + folded store
    serve exactly what the folded index + live post-change corpus
    serves."""
    import shutil

    import pytest

    tbl = _scratch("vs_fold_store")
    idx = _scratch("vs_fold_idx")
    shutil.rmtree(tbl, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    # base corpus: vec 3 missing (inserted later), vec 1 doctored so
    # only the fold's update-postimage restores the true vector
    doctored = emb.filter(F.col("vec_id") != 3).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 1,
            F.expr("transform(embedding, x -> float(0.5))"),
        ).otherwise(F.col("embedding")),
    )
    books = similarity.pq_codebooks(emb)
    similarity.write_pq_index(doctored, idx, codebooks=books)
    similarity.write_vector_store(doctored, tbl)
    ct = lambda df, t: df.withColumn("_change_type", F.lit(t))  # noqa: E731
    changes = (
        ct(doctored.filter(F.col("vec_id") == 1), "update_preimage")
        .unionByName(ct(emb.filter(F.col("vec_id") == 1), "update_postimage"))
        .unionByName(ct(doctored.filter(F.col("vec_id") == 2), "delete"))
        .unionByName(ct(emb.filter(F.col("vec_id") == 3), "insert"))
    )
    with pytest.raises(ValueError, match="gen must be > 0"):
        similarity.apply_changes_to_vector_store(spark, changes, tbl, 0)
    for _ in range(2):  # at-least-once replay: same gen, same rows
        similarity.apply_changes_to_pq_index(spark, idx, changes, 1)
        similarity.apply_changes_to_vector_store(spark, changes, tbl, 1)
    # direct resolution: update serves the NEW vector, delete is gone
    res = {
        r.vec_id: list(r.embedding)
        for r in similarity._store_vectors(spark, tbl, [1, 2, 3]).collect()
    }
    true1 = list(emb.filter(F.col("vec_id") == 1).collect()[0].embedding)
    assert set(res) == {1, 3} and res[1] == true1
    final = emb.filter(F.col("vec_id") != 2)
    qids = [0, 1, 3, 4, 5]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in final.filter(F.col("vec_id").isin(qids)).collect()
    ]
    live = sorted(
        map(
            tuple,
            similarity.pq_topk_indexed(
                spark, idx, queries, emb=final, k=3
            ).collect(),
        )
    )
    stored = sorted(
        map(
            tuple,
            similarity.pq_topk_indexed(
                spark, idx, queries, vector_store=tbl, k=3
            ).collect(),
        )
    )
    assert stored == live and stored
    similarity.compact_vector_store(spark, tbl)
    rows = spark.read.parquet(f"{tbl}/rows")
    gens = {r[0] for r in rows.select("gen").distinct().collect()}
    assert gens == {0}
    # dead id physically dropped, resolution unchanged, serve unchanged
    assert rows.filter(F.col("vec_id") == 2).count() == 0
    res2 = {
        r.vec_id: list(r.embedding)
        for r in similarity._store_vectors(spark, tbl, [1, 2, 3]).collect()
    }
    assert res2 == res
    stored2 = sorted(
        map(
            tuple,
            similarity.pq_topk_indexed(
                spark, idx, queries, vector_store=tbl, k=3
            ).collect(),
        )
    )
    assert stored2 == live
    shutil.rmtree(tbl, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)


def test_murmur3_long_matches_spark_hash(spark):
    """The driver-side bucket router is a BIT-EXACT twin of Spark's
    ``F.hash`` over longs — negative, zero, wide, and dense ids all
    agree, so probe ids can never route to directories their rows
    aren't in."""
    ids = (
        list(range(-5, 50))
        + [2**31 - 1, 2**31, -(2**31), 2**62, -(2**62), 9_000_017]
        + [10 + 7001 * i for i in range(64)]
    )
    got = {
        r.vec_id: r.h
        for r in spark.createDataFrame([(i,) for i in ids], "vec_id long")
        .select("vec_id", F.hash("vec_id").alias("h"))
        .collect()
    }
    for i in ids:
        assert similarity._murmur3_long(i) == got[i], i
        for n in (2, 64, 2048):
            assert similarity._store_bucket_of(i, n) == got[i] % n


@pytest.mark.slow
def test_concurrent_store_serves_raise_only_threshold(spark):
    """Two store serves running CONCURRENTLY in one session (the
    round-8 review race: a set-then-restore bracket let serve A's
    ``finally`` re-lower ``parallelPartitionDiscovery.threshold``
    under serve B's unresolved read). The raise-only contract: after
    any number of concurrent serves the threshold is ≥ what the
    largest serve needed, never restored down, and every serve's
    result is bit-identical to its live-frame twin."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    store, flat = _scratch("vs_conc_store"), _scratch("vs_conc_flat")
    for d in (store, flat):
        shutil.rmtree(d, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_pq_index(emb, flat)
    similarity.write_vector_store(emb, store, n_buckets=128)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(QUERY_IDS[:5])).collect()
    ]
    live = sorted(
        map(
            tuple,
            similarity.pq_topk_indexed(
                spark, flat, queries, emb=emb, k=3
            ).collect(),
        )
    )

    def serve(_):
        return sorted(
            map(
                tuple,
                similarity.pq_topk_indexed(
                    spark, flat, queries, k=3, vector_store=store
                ).collect(),
            )
        )

    before = int(spark.conf.get(similarity._DISCOVERY_CONF))
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(serve, range(4)))
    after = int(spark.conf.get(similarity._DISCOVERY_CONF))
    for got in results:
        assert got == live and got
    # raise-only: never below where it started, and at least the bar
    # the serves' bucket-directory reads needed
    assert after >= before
    # a second serve after the burst still sees the raised threshold
    # (nothing restored it down behind our back)
    assert serve(0) == live
    assert int(spark.conf.get(similarity._DISCOVERY_CONF)) == after
    for d in (store, flat):
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_compact_vector_store_crash_recovery(spark):
    """compact_vector_store's rename-swap discipline: a stale stage
    directory (crash mid-staged-write) is cleared and recompacted; a
    torn swap (crash between delete and rename — ``rows`` gone, stage
    complete) self-heals on the next run; serving is identical after
    every recovery; a store with neither directory raises loudly."""
    import os
    import shutil

    import pytest

    tbl, idx = _scratch("vs_crash_store"), _scratch("vs_crash_idx")
    for d in (tbl, idx):
        shutil.rmtree(d, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_pq_index(emb, idx)
    similarity.write_vector_store(emb, tbl, n_buckets=16)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(QUERY_IDS[:3])).collect()
    ]
    serve = lambda: sorted(  # noqa: E731
        map(
            tuple,
            similarity.pq_topk_indexed(
                spark, idx, queries, k=3, vector_store=tbl
            ).collect(),
        )
    )
    want = serve()
    assert want
    # crash mid-staged-write: a half-written rows.compact next to a
    # live rows tree — the next compaction must clear it, not swap it
    os.makedirs(f"{tbl}/rows.compact/bucket=0", exist_ok=True)
    with open(f"{tbl}/rows.compact/bucket=0/junk", "w") as fh:
        fh.write("torn")
    similarity.compact_vector_store(spark, tbl)
    assert not os.path.exists(f"{tbl}/rows.compact")
    assert serve() == want
    # crash inside the swap window: rows renamed aside, stage complete
    # but not yet renamed in — every read fails loudly on the missing
    # directory, and a re-run restores from the STAGE (the new data)
    # and clears the aside copy
    os.rename(f"{tbl}/rows", f"{tbl}/rows.compact")
    with pytest.raises(Exception):
        serve()
    similarity.compact_vector_store(spark, tbl)
    assert os.path.exists(f"{tbl}/rows")
    assert not os.path.exists(f"{tbl}/rows.compact")
    assert serve() == want
    # crash mid-window WITH the aside copy still present: stage wins
    # (it is complete by the write-before-rename ordering), old is
    # cleared — the rename-aside fix for the round-9 review's
    # partial-delete data-loss window
    os.rename(f"{tbl}/rows", f"{tbl}/rows.compact")
    os.makedirs(f"{tbl}/rows.old/bucket=0", exist_ok=True)
    with open(f"{tbl}/rows.old/bucket=0/stale", "w") as fh:
        fh.write("old generation")
    similarity.compact_vector_store(spark, tbl)
    assert os.path.exists(f"{tbl}/rows")
    assert not os.path.exists(f"{tbl}/rows.old")
    assert not os.path.exists(f"{tbl}/rows.compact")
    assert serve() == want
    # crash after the swap, before the aside delete: the leftover
    # rows.old (even partially deleted) is cleared on the next run
    os.makedirs(f"{tbl}/rows.old", exist_ok=True)
    similarity.compact_vector_store(spark, tbl)
    assert not os.path.exists(f"{tbl}/rows.old")
    assert serve() == want
    # neither directory: loud, named failure
    shutil.rmtree(f"{tbl}/rows")
    with pytest.raises(ValueError, match="no vector store rows"):
        similarity.compact_vector_store(spark, tbl)
    for d in (tbl, idx):
        shutil.rmtree(d, ignore_errors=True)


def test_train_sample_is_hash_decorrelated_and_deterministic(spark):
    """Round-8 verdict #1: the quantizer/codebook training sample is
    a seeded-hash draw over the WHOLE id range, not the corpus head —
    on an id-ordered corpus a bounded sample must still see late ids
    (ingestion follows content, so the head is one content slice).
    Pins: (a) the draw reaches deep into the id range, (b) it is
    NOT the head slice, (c) repeated pulls are bit-identical, (d) a
    corpus inside train_rows yields exactly the full corpus in
    vec_id order (fixture behavior unchanged from the head era),
    (e) an oversized k warns loudly at the clamp and still returns
    k=sample-size centroids."""
    import warnings as _w

    import numpy as np

    emb = spark.range(10_000).selectExpr(
        "id as vec_id",
        "array(cast(sin(id) as float), cast(cos(id) as float), "
        "cast(sin(id * 2) as float)) as embedding",
    )
    first = similarity._train_matrix(emb, 500)
    again = similarity._train_matrix(emb, 500)
    assert np.array_equal(first, again)
    # the drawn ids, replayed through the same hash order
    ids = [
        int(r.vec_id)
        for r in emb.select("vec_id")
        .orderBy(
            F.xxhash64(F.col("vec_id"), F.lit(similarity.TRAIN_SAMPLE_SEED)),
            F.col("vec_id"),
        )
        .limit(500)
        .collect()
    ]
    assert max(ids) > 5_000, "sample never reaches the late half"
    assert sorted(ids) != list(range(500)), "sample is the head slice"
    # (d) corpus within train_rows -> full corpus, vec_id order
    small = emb.filter(F.col("vec_id") < 64)
    mat = similarity._train_matrix(small, 500)
    assert len(mat) == 64
    want = np.array(
        [list(r.embedding) for r in small.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    assert np.array_equal(mat, want)
    # (e) loud clamp
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        cids, cmat = similarity.kmeans_centroids(small, k=256)
    assert any("clamping" in str(w.message) for w in rec)
    assert len(cids) == 64 == len(cmat)
    # train_rows scales with k: asking for k=256 pulls >= 100*256 rows
    mat_k = similarity._train_matrix(emb, max(100, 100 * 256))
    assert len(mat_k) == 10_000  # floor exceeds the corpus -> all rows
    # (f) the K-scaled floor still respects the module's driver-collect
    # ceiling: a k whose floor exceeds MAX_COLLECT_ROWS warns and clips
    # instead of pulling an unbounded toPandas (round-9 review)
    orig_cap = similarity.MAX_COLLECT_ROWS
    similarity.MAX_COLLECT_ROWS = 2_000
    try:
        with _w.catch_warnings(record=True) as rec2:
            _w.simplefilter("always")
            cids2, _ = similarity.kmeans_centroids(emb, k=64, train_rows=5_000)
        assert any("driver-collect ceiling" in str(w.message) for w in rec2)
        assert len(cids2) == 64
    finally:
        similarity.MAX_COLLECT_ROWS = orig_cap


@pytest.mark.slow
def test_flat_tier_bulk_serves_equal_latency_loops(spark):
    """Round 10 (verdict Next #3): the flat tiers get the same bulk
    (DataFrame-in) twins the hybrid has — ``pq_topk_bulk`` over a
    block-decomposed cogroup, ``ivf_topk_bulk`` over the shared probe
    frame — each BIT-IDENTICAL to its latency serve across re-rank
    sources, the exclude flag, and (for PQ) a non-default block count
    (partitioning must never move values: the shortlist order is
    total)."""
    import shutil

    import pytest

    pq, ivf, store = (
        _scratch("bulk_pq"), _scratch("bulk_ivf"), _scratch("bulk_pq_store")
    )
    for d in (pq, ivf, store):
        shutil.rmtree(d, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_pq_index(emb, pq)
    similarity.write_ivf_index(emb, ivf, n_centroids=8)
    similarity.write_vector_store(emb, store, n_buckets=32)
    qids = QUERY_IDS[:6]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    qframe = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for kw, bulk_kw in (
        ({"emb": emb}, {"emb": emb}),
        ({"vector_store": store}, {"vector_store": store}),
        (
            {"emb": emb, "exclude_query_ids": False},
            {"emb": emb, "exclude_query_ids": False},
        ),
        ({"emb": emb}, {"emb": emb, "n_blocks": 3}),
        # forces the (code-block × query-block) GRID: 6 queries with
        # a 2-query task bound → 3 query blocks — values must not
        # move (grid membership is by hash; the shortlist order is
        # total)
        ({"emb": emb}, {"emb": emb, "_grid": 2}),
    ):
        grid = bulk_kw.pop("_grid", None)
        if grid:
            bulk_kw["max_queries_per_task"] = grid
        want = sorted(
            map(
                tuple,
                similarity.pq_topk_indexed(
                    spark, pq, queries, k=3, **kw
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                similarity.pq_topk_bulk(
                    spark, pq, qframe, k=3, **bulk_kw
                ).collect(),
            )
        )
        assert got == want and got, (kw.keys(), bulk_kw.keys())
    for kw in ({}, {"exclude_query_ids": False}):
        want = sorted(
            map(
                tuple,
                similarity.ivf_topk_indexed(
                    spark, ivf, queries, k=3, **kw
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                similarity.ivf_topk_bulk(
                    spark, ivf, qframe, k=3, **kw
                ).collect(),
            )
        )
        assert got == want and got, kw.keys()
    with pytest.raises(ValueError, match="exactly one"):
        similarity.pq_topk_bulk(spark, pq, qframe, k=3)
    with pytest.raises(ValueError, match="exactly one"):
        similarity.pq_topk_bulk(
            spark, pq, qframe, emb=emb, k=3, vector_store=store
        )
    for d in (pq, ivf, store):
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_ivfpq_bulk_serve_equals_latency_loop(spark):
    """ANN11 (round 9): the bulk (DataFrame-in) hybrid serve is
    BIT-IDENTICAL to the latency (driver-list) serve — flat and
    residual modes, live-frame and vector-store re-rank sources,
    exclude flag both ways — and validates its re-rank-source
    contract loudly. Bit-equality is the whole claim: probe
    selection, executor-side distance tables, task-local top-S, and
    the shared re-rank tail must reproduce the driver path under a
    completely different distribution of the work."""
    import shutil

    import pytest

    hyb, res, store = (
        _scratch("bulk_hyb"), _scratch("bulk_res"), _scratch("bulk_store")
    )
    for d in (hyb, res, store):
        shutil.rmtree(d, ignore_errors=True)
    emb = load_table(spark, SF_CHECK, "embeddings")
    similarity.write_ivfpq_index(emb, hyb, n_centroids=8)
    similarity.write_ivfpq_index(emb, res, n_centroids=8, residual=True)
    similarity.write_vector_store(emb, store, n_buckets=32)
    qids = QUERY_IDS[:6]
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    ]
    qframe = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for path in (hyb, res):
        for kw in (
            {"emb": emb},
            {"vector_store": store},
            {"emb": emb, "exclude_query_ids": False},
        ):
            want = sorted(
                map(
                    tuple,
                    similarity.ivfpq_topk_indexed(
                        spark, path, queries, k=3, **kw
                    ).collect(),
                )
            )
            got = sorted(
                map(
                    tuple,
                    similarity.ivfpq_topk_bulk(
                        spark, path, qframe, k=3, **kw
                    ).collect(),
                )
            )
            assert got == want and got, (path, kw.keys())
    # round 10: the store re-rank routes by batch size — the small
    # batch above took the bucket-PRUNED read; force the cutoff to 0
    # so the same batch takes the whole-store resolution scan, and
    # pin that both routes are bit-identical to the latency serve
    want = sorted(
        map(
            tuple,
            similarity.ivfpq_topk_indexed(
                spark, hyb, queries, k=3, vector_store=store
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            similarity.ivfpq_topk_bulk(
                spark, hyb, qframe, k=3, vector_store=store, prune_max_ids=0
            ).collect(),
        )
    )
    assert got == want and got
    with pytest.raises(ValueError, match="exactly one"):
        similarity.ivfpq_topk_bulk(spark, hyb, qframe, k=3)
    with pytest.raises(ValueError, match="exactly one"):
        similarity.ivfpq_topk_bulk(
            spark, hyb, qframe, emb=emb, k=3, vector_store=store
        )
    for d in (hyb, res, store):
        shutil.rmtree(d, ignore_errors=True)
