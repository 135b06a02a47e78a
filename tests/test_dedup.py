"""Dedup invariants: LSH ⊆/== exact, keep-first semantics, simhash
banding exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import dedup
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_CHECK


def _docs(spark):
    return load_table(spark, SF_CHECK, "documents")


def test_lsh_equals_exact_on_planted_pairs(spark):
    docs = _docs(spark)
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.near_dup_pairs_exact(docs, n=3, threshold=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_near_dup_pairs(
            docs, n=3, n_hashes=16, bands=8, threshold=0.8
        ).collect()
    }
    assert lsh <= exact  # LSH verification never invents pairs
    # 8 bands × r=2 recalls j≥0.8 pairs w.p. ≈ 1; deterministic here
    assert lsh == exact
    assert len(exact) == 25  # generator plants 25 near-dup pairs


def test_dedup_keep_first(spark):
    docs = _docs(spark).limit(10)
    copies = docs.withColumn("doc_id", F.col("doc_id") + 1000)
    doubled = docs.union(copies)
    kept = dedup.dedup_keep_first(doubled)
    assert kept.count() == 10
    # the kept representative is always the lowest doc_id (the original)
    assert kept.filter(F.col("doc_id") >= 1000).count() == 0


def test_simhash_banding_is_exact_blocking(spark):
    """All-pairs hamming ≤ 3 must equal the banded-join result."""
    docs = _docs(spark).limit(120)
    s = dedup.simhash(docs)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= 3)
    )
    brute_pairs = {(r.doc_a, r.doc_b) for r in brute.collect()}
    banded_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert banded_pairs == brute_pairs


def test_prefix_filter_equals_naive(spark):
    """PPJoin prefix+length filtering is lossless: the filtered exact
    near-dup (registry implementation) must equal the full
    inverted-index form pair-for-pair at both thresholds."""
    from map_reduce_sf_crime_spark.sources.parquet import load_table

    docs = load_table(spark, SF_CHECK, "documents")
    for t in (0.5, 0.8):
        fast = {(r.doc_a, r.doc_b, r.jaccard)
                for r in dedup.near_dup_pairs_exact(docs, n=3, threshold=t).collect()}
        naive = {(r.doc_a, r.doc_b, r.jaccard)
                 for r in dedup.near_dup_pairs_naive(docs, n=3, threshold=t).collect()}
        assert fast == naive, f"threshold {t}"


def test_dup_clusters_match_union_find(spark):
    """Label-propagation components == driver union-find ground truth."""
    docs = _docs(spark)
    pairs = dedup.near_dup_pairs_exact(docs, n=3, threshold=0.8)
    edges = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {r.doc_id: r.cluster_id for r in dedup.dup_clusters(pairs).collect()}
    assert got == want
    assert want, "fixture must contain at least one near-dup component"


def test_incremental_flags_match_pair_restriction(spark):
    """Incremental (batch-vs-catalog) flags must equal the full
    near-dup pair set restricted to incoming×catalog pairs."""
    docs = _docs(spark)
    incoming = (F.col("doc_id") % 5) == 4
    flags = {
        r.doc_id: (r.n_cat_matches, r.best_jaccard, r.is_dup)
        for r in dedup.incremental_lsh_flags(
            docs, incoming, n=3, threshold=0.8
        ).collect()
    }
    # derive the expected answer from the (already equivalence-tested)
    # exact pair set: keep pairs with exactly one incoming endpoint
    pairs = dedup.near_dup_pairs_exact(docs, n=3, threshold=0.8).collect()
    expected: dict[int, list[float]] = {}
    for r in pairs:
        a_inc, b_inc = r.doc_a % 5 == 4, r.doc_b % 5 == 4
        if a_inc != b_inc:
            expected.setdefault(r.doc_a if a_inc else r.doc_b, []).append(
                r.jaccard
            )
    n_incoming = docs.filter(incoming).count()
    assert len(flags) == n_incoming  # one row per incoming doc
    for doc_id, (n, best, dup) in flags.items():
        js = expected.get(doc_id, [])
        assert n == len(js)
        assert best == (max(js) if js else 0.0)
        assert dup == (1 if js else 0)
    # the fixture plants near-dup pairs; some must straddle the split
    assert sum(f[2] for f in flags.values()) > 0


def test_incremental_catalog_backed_matches_recompute(spark):
    """The persisted-catalog form (write once, read bucketed, shuffle
    only the batch) must produce EXACTLY the recompute form's output —
    same band keys, same candidates, same verified flags."""
    import os
    import shutil

    docs = _docs(spark)
    pred = (F.col("doc_id") % 5) == 4
    expected = {
        tuple(r)
        for r in dedup.incremental_lsh_flags(docs, pred, n=3, threshold=0.8).collect()
    }
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cat_sig_buckets", "cat_sig_shingles"):
        spark.sql(f"drop table if exists {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    dedup.write_signature_catalog(
        docs.filter(~pred), "cat_sig_buckets", "cat_sig_shingles"
    )
    got_df = dedup.incremental_lsh_flags_cataloged(
        spark, docs.filter(pred), "cat_sig_buckets", "cat_sig_shingles", threshold=0.8
    )
    got = {tuple(r) for r in got_df.collect()}
    assert got == expected
    # the catalog bucket probe must ride the bucketed layout: no
    # exchange on the catalog-side scan of cat_sig_buckets
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "cat_sig_buckets" in l]
    assert scan_lines, plan
    assert "SelectedBucketsCount" in "\n".join(scan_lines), scan_lines


def test_ppjoin_prunes_lossless_at_exact_threshold(spark):
    """A pair at exactly J = t with t·n inexact in float64 (0.8·5 =
    4.000000000000001) must survive the prefix and length prunes: the
    PRUNE_EPS slack keeps the provably-lossless bounds lossless."""
    from map_reduce_sf_crime_spark.operators.dedup import (
        near_dup_pairs_exact,
        near_dup_pairs_naive,
    )

    words = [f"w{i}" for i in range(7)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(words[:6]), "s"),   # 4 distinct 3-gram shingles
            (2, " ".join(words[:7]), "s"),   # 5 shingles, superset
        ],
        "doc_id long, text string, source string",
    )
    exact = sorted(
        map(tuple, near_dup_pairs_exact(docs, n=3, threshold=0.8).collect())
    )
    naive = sorted(
        map(tuple, near_dup_pairs_naive(docs, n=3, threshold=0.8).collect())
    )
    assert exact == naive
    assert exact and exact[0][:2] == (1, 2) and exact[0][2] == 0.8


def test_dup_clusters_pathological_chain(spark):
    """Pathological-graph behavior: the large-star/small-star
    contraction roughly HALVES each vertex's distance to its
    component minimum per round, so a CHAIN of n docs converges in
    ≤ ⌈log₂ n⌉ + 1 rounds (the round-4 min-label form needed O(n)).
    A max_iter below the log bound must raise loudly (never return
    silently-divergent labels); at the bound the chain AND a star
    mix converge to single components labeled by min doc_id."""
    import math

    chain = [(i, i + 1) for i in range(29)]          # 30-vertex chain
    star = [(100, s) for s in range(101, 121)]       # diameter 2
    pairs = spark.createDataFrame(chain + star, "doc_a long, doc_b long")

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(pairs, max_iter=3)

    log_bound = math.ceil(math.log2(30)) + 1  # = 6
    labels = {
        r.doc_id: r.cluster_id
        for r in dedup.dup_clusters(pairs, max_iter=log_bound).collect()
    }
    assert dedup.LAST_CC_ROUNDS <= log_bound
    assert all(labels[i] == 0 for i in range(30))
    assert all(labels[s] == 100 for s in [100, *range(101, 121)])


def test_incremental_catalog_daily_append_loop(spark):
    """The daily production loop end-to-end: day 1's batch is flagged
    against the catalog, then APPENDED to it (append_signature_catalog
    — bucketed append keeps the shuffle-free probe); day 2's batch
    must then see day 1's docs as catalog. Equivalence oracle: the
    recompute form over the grown corpus."""
    import os
    import shutil

    docs = _docs(spark)
    day1 = (F.col("doc_id") % 5) == 3
    day2 = (F.col("doc_id") % 5) == 4
    base_pred = ~day1 & ~day2

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    bt, st = "loop_sig_buckets", "loop_sig_shingles"
    for t in (bt, st):
        spark.sql(f"drop table if exists {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    dedup.write_signature_catalog(docs.filter(base_pred), bt, st)
    # day 1: flag, then append to the catalog
    dedup.incremental_lsh_flags_cataloged(
        spark, docs.filter(day1), bt, st, threshold=0.8
    ).collect()
    dedup.append_signature_catalog(docs.filter(day1), bt, st)
    # the bucketed layout must survive the append (no probe-side
    # regression to a shuffled join): the day-2 probe's catalog scan
    # still rides the bucket spec
    assert spark.catalog.tableExists(bt)
    probe_df = dedup.incremental_lsh_flags_cataloged(
        spark, docs.filter(day2), bt, st, threshold=0.8
    )
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if bt in l]
    assert scan_lines and "SelectedBucketsCount" in "\n".join(scan_lines)

    # day 2 must dedup against base + day 1
    got = {
        tuple(r)
        for r in dedup.incremental_lsh_flags_cataloged(
            spark, docs.filter(day2), bt, st, threshold=0.8
        ).collect()
    }
    want = {
        tuple(r)
        for r in dedup.incremental_lsh_flags(
            docs.filter(base_pred | day1 | day2), day2, threshold=0.8
        ).collect()
    }
    assert got == want
    # and the catalog really grew: a day-1 doc is now probe-visible
    cat_ids = {r.doc_id for r in spark.table(st).select("doc_id").collect()}
    day1_ids = {r.doc_id for r in docs.filter(day1).select("doc_id").collect()}
    assert day1_ids <= cat_ids


def test_duplicate_span_stats_exact(spark):
    """Substring-level dedup (duplicated n-gram spans): checked
    against an independent pure-Python reference on a fixture with a
    cross-doc shared run, an internal repetition, overlapping spans,
    and a too-short doc."""
    n = 4
    fixture = {
        0: "a b c d e f g h",              # shares a 5-token run with doc 1
        1: "zz a b c d e yy ww",           # → overlapping dup 4-grams merge
        2: "p q r s p q r s",              # internal repetition
        3: "m n o",                        # shorter than n: zero grams
        4: "u v w x y z u2 v2 w2 x2",      # fully unique
    }
    docs = spark.createDataFrame(
        list(fixture.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_grams, r.n_dup_grams, r.dup_token_frac)
        for r in dedup.duplicate_span_stats(docs, n=n).collect()
    }

    # independent reference
    from collections import Counter

    tok = {d: t.split() for d, t in fixture.items()}
    gram_occurrences = Counter()
    for d, ts in tok.items():
        for i in range(max(0, len(ts) - n + 1)):
            gram_occurrences[tuple(ts[i : i + n])] += 1
    want = {}
    for d, ts in tok.items():
        spans = [
            (i, i + n - 1)
            for i in range(max(0, len(ts) - n + 1))
            if gram_occurrences[tuple(ts[i : i + n])] >= 2
        ]
        covered = set()
        for s, e in spans:
            covered.update(range(s, e + 1))
        want[d] = (
            len(ts),
            max(0, len(ts) - n + 1),
            len(spans),
            round(len(covered) / max(1, len(ts)), 6),
        )
    assert got == want
    # sanity on the fixture's intent: docs 0/1 and 2 have dup spans,
    # 3 and 4 have none
    assert want[0][2] > 0 and want[1][2] > 0 and want[2][2] > 0
    assert want[3][2] == 0 and want[4][2] == 0
    # doc 1's overlapping dup grams merged: frac < grams x n / tokens
    assert got[1][3] == 5 / 8


@pytest.mark.slow
def test_append_replay_does_not_corrupt_flags(spark):
    """Crash-and-re-run tolerance: appending the same batch's
    signatures TWICE (the replay a mid-loop crash produces) duplicates
    storage rows but must not change any flag — n_cat_matches counts
    distinct catalog docs."""
    import os
    import shutil

    docs = _docs(spark)
    day1 = (F.col("doc_id") % 5) == 3
    day2 = (F.col("doc_id") % 5) == 4
    base_pred = ~day1 & ~day2

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    results = {}
    for label, n_appends in (("once", 1), ("twice", 2)):
        bt, st = f"replay_{label}_buckets", f"replay_{label}_shingles"
        for t in (bt, st):
            spark.sql(f"drop table if exists {t}")
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        dedup.write_signature_catalog(docs.filter(base_pred), bt, st)
        for _ in range(n_appends):
            dedup.append_signature_catalog(docs.filter(day1), bt, st)
        results[label] = {
            tuple(r)
            for r in dedup.incremental_lsh_flags_cataloged(
                spark, docs.filter(day2), bt, st, threshold=0.8
            ).collect()
        }
    assert results["once"] == results["twice"]


def test_catalog_meta_stamp_guards_parameter_mismatch(spark):
    """Probing or appending a persisted signature catalog with
    different (n, n_hashes, bands) would silently match NOTHING (band
    keys are pure functions of those params) — the meta stamp turns
    that into a loud error."""
    import os
    import shutil

    import pytest

    docs = _docs(spark)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("meta_sig_buckets", "meta_sig_buckets_meta", "meta_sig_shingles"):
        spark.sql(f"drop table if exists {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    dedup.write_signature_catalog(
        docs, "meta_sig_buckets", "meta_sig_shingles", n=3, n_hashes=16, bands=8
    )
    row = spark.table("meta_sig_buckets_meta").collect()[0]
    assert (row["n"], row["n_hashes"], row["bands"]) == (3, 16, 8)
    # matching params pass
    dedup.incremental_lsh_flags_cataloged(
        spark, docs.limit(5), "meta_sig_buckets", "meta_sig_shingles",
        n=3, n_hashes=16, bands=8,
    ).collect()
    # mismatched shingle width / band geometry raise on probe AND append
    with pytest.raises(ValueError, match="written with"):
        dedup.incremental_lsh_flags_cataloged(
            spark, docs.limit(5), "meta_sig_buckets", "meta_sig_shingles", n=4
        )
    with pytest.raises(ValueError, match="written with"):
        dedup.append_signature_catalog(
            docs.limit(5), "meta_sig_buckets", "meta_sig_shingles", bands=4
        )
    for t in ("meta_sig_buckets", "meta_sig_buckets_meta", "meta_sig_shingles"):
        spark.sql(f"drop table if exists {t}")


@pytest.mark.slow
def test_catalog_change_feed_fold(spark):
    """Change-feed fold for the persisted signature catalog
    (apply_changes_to_signature_catalog): deletes/update-preimages
    tombstone the stored signatures generation-scoped, inserts/
    update-postimages append under the fold's gen — so the probe
    equals a from-scratch rebuild on the post-change corpus. Pins all
    four directions of staleness: a DELETED doc stops flagging new
    near-dups, an UPDATED doc stops matching on its stale shingles
    and starts matching on the new ones, an INSERTED doc matches, and
    a doc deleted-then-REVIVED in a later gen matches again. Plus:
    replaying an old fold after a revival cannot re-kill it
    (generation scoping), and the tombstone filter preserves the
    bucketed probe plan."""
    import os
    import shutil

    t_dup = "alpha beta gamma delta epsilon zeta"
    t_far = "one two three four five six"
    t_new = "seven eight nine ten eleven twelve"
    t_uni = "unique words nothing matches here ever"
    docs = spark.createDataFrame(
        [(1, t_dup), (2, t_dup + " eta theta"), (3, t_far)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(101, t_dup), (102, t_far), (103, t_uni)],
        "doc_id long, text string",
    )
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    bt, st, bt2, st2 = "cf_sig_b", "cf_sig_s", "cf_sig_b2", "cf_sig_s2"
    for t in (bt, st, bt2, st2, f"{bt}_dead", f"{bt}_meta", f"{bt2}_meta"):
        spark.sql(f"drop table if exists {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    def flags(b=bt, s=st):
        return {
            r.doc_id: (r.n_cat_matches, r.best_jaccard, r.is_dup)
            for r in dedup.incremental_lsh_flags_cataloged(
                spark, batch, b, s, threshold=0.8
            ).collect()
        }

    dedup.write_signature_catalog(docs, bt, st)
    before = flags()
    assert before[101][2] == 1 and before[102][2] == 1 and before[103][2] == 0

    # gen 1: delete doc 1, rewrite doc 3's text, insert doc 4 (≈103)
    changes = spark.createDataFrame(
        [
            (1, t_dup, "delete"),
            (3, t_far, "update_preimage"),
            (3, t_new, "update_postimage"),
            (4, t_uni + " almost", "insert"),
        ],
        "doc_id long, text string, _change_type string",
    )
    dedup.apply_changes_to_signature_catalog(spark, changes, bt, st, gen=1)
    after = flags()
    # oracle: a fresh catalog over the post-change corpus
    post = spark.createDataFrame(
        [(2, t_dup + " eta theta"), (3, t_new), (4, t_uni + " almost")],
        "doc_id long, text string",
    )
    dedup.write_signature_catalog(post, bt2, st2)
    assert after == flags(bt2, st2)
    assert after[101][2] == 0      # its only ≥0.8 match was deleted
    assert after[102][2] == 0      # update killed the stale shingles
    assert after[103][2] == 1      # the inserted doc matches

    # gen 2: revive doc 1 verbatim — must match again
    revive = spark.createDataFrame(
        [(1, t_dup, "insert")], "doc_id long, text string, _change_type string"
    )
    dedup.apply_changes_to_signature_catalog(spark, revive, bt, st, gen=2)
    revived = flags()
    assert revived[101] == before[101]

    # replaying the OLD gen-1 fold cannot re-kill the gen-2 revival,
    # and the fold is idempotent on flags
    dedup.apply_changes_to_signature_catalog(spark, changes, bt, st, gen=1)
    assert flags() == revived

    # tombstone filtering must not cost the bucketed probe layout
    plan = (
        dedup.incremental_lsh_flags_cataloged(spark, batch, bt, st)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan_lines = [l for l in plan.splitlines() if bt in l and "_dead" not in l]
    assert scan_lines and "SelectedBucketsCount" in "\n".join(scan_lines)

    for t in (bt, st, bt2, st2, f"{bt}_dead", f"{bt}_meta", f"{bt2}_meta"):
        spark.sql(f"drop table if exists {t}")
