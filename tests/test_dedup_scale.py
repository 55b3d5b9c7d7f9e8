"""Scale-safety and honesty tests for the dedup / simsearch LSH paths.

Covers the round-2 hardening:

* hot-bucket caps: a degenerate LSH bucket (1k identical docs) must not
  produce a quadratic candidate explosion — the capped join returns
  nothing and ``exact`` dedup is the recovery path for that mass;
* simhash banding honesty: the default (max_hamming=3, 4 chunks) has a
  pigeonhole *guarantee*, verified as full recall against a brute-force
  all-pairs twin; asking beyond the guarantee raises unless explicitly
  best-effort;
* the vectorized simhash kernel is bit-identical to the per-token
  scalar definition;
* hyperplane LSH near-dups match a numpy twin of the same banding.
"""

from __future__ import annotations


import numpy as np
import pytest

from scrapely_spark.spark import dedup, simsearch


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- simhash


def _simhash_tokens(tokens) -> int:
    import hashlib

    votes = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), 1, -1)
    fp = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        fp |= np.uint64(1) << np.uint64(i)
    return int(fp.astype(np.int64))


def _simhash_scalar(text) -> int:
    """Per-token reference definition of the fingerprint.

    NULL fingerprints to 0 and tokens are maximal runs outside RE2's
    ``\\s`` class — the exact semantics the DuckDB oracle implements.
    """
    if text is None:
        return 0
    return _simhash_tokens(dedup._TOKEN_RE.findall(str(text).lower()))


def test_simhash_kernel_matches_scalar_definition(spark):
    rows = [(i, "the quick brown fox %d jumps over %d lazy dogs"
             % (i % 7, i % 3)) for i in range(40)]
    rows += [(100, ""), (101, "   "), (102, "one"),
             (103, "a b c d e f g h i j k l m n o p q r s t")]
    got = {r.doc_id: r.simhash
           for r in dedup.simhash(_docs(spark, rows)).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == _simhash_scalar(text), doc_id


def test_simhash_null_and_unicode_whitespace(spark):
    # NULL text fingerprints to 0 (parity with the oracle's LEFT JOIN +
    # coalesce — NOT str(None) -> the token 'none'), and the tokenizer
    # splits on RE2's \s class only, so a unicode NBSP stays inside the
    # token exactly as DuckDB's string_split_regex would keep it
    rows = [(1, None), (2, "a b"), (3, "a b"), (4, "a b c")]
    got = {r.doc_id: r.simhash
           for r in dedup.simhash(_docs(spark, rows)).collect()}
    assert got[1] == 0
    assert got[2] == _simhash_tokens(["a b"])
    assert got[3] == _simhash_tokens(["a", "b"])
    assert got[4] == _simhash_tokens(["a b", "c"])


def test_md5_u64_batch_paths_bit_identical():
    # the >=4096-token threshold routes big batches through DuckDB's
    # vectorized md5; both paths must produce int(hexdigest[:16], 16)
    import hashlib

    toks = np.array(["tok%d" % i for i in range(5000)]
                    + ["naïve", "héllo", "日本語", "x" * 200],
                    dtype=object)
    want = np.fromiter(
        (int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in toks),
        dtype=np.uint64, count=len(toks))
    assert np.array_equal(dedup._md5_u64(toks), want)           # duckdb
    assert np.array_equal(dedup._md5_u64(toks[:64]), want[:64])  # hashlib


def test_lsh_caches_freed_after_use(spark):
    # long sessions issue many dedup calls; each call's cached
    # intermediates (band buckets, shingle sets) must be freed once the
    # caller drops the result — no cached-plan accumulation
    import gc

    spark.catalog.clearCache()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    rows = [(i, "w%d x%d y%d z%d q%d" % (i % 5, i % 7, i % 3, i % 2,
                                         i % 11)) for i in range(60)]
    # minhash_candidates is cache-free since the array-local signature
    # rewrite (its self-join sides share one reused exchange), and
    # jaccard_pairs materializes via eager localCheckpoint (block
    # manager, not CacheManager — freed by the ContextCleaner on GC),
    # so both assert only the no-leak half
    for fn, uses_cache in (
            (dedup.minhash_candidates, False),
            (lambda d: dedup.jaccard_pairs(d, threshold=0.1), False),
            (dedup.simhash_near_pairs, True),
            (lambda d: dedup.shared_substring_pairs(
                d, n_chars=8, min_shared=1), True)):
        res = fn(_docs(spark, rows))
        res.collect()
        if uses_cache:
            assert not cache_mgr.isEmpty()  # cache was actually used
        del res
        gc.collect()
        assert cache_mgr.isEmpty(), "cached intermediates leaked"


def test_simhash_default_banding_has_full_recall(spark):
    # ~1k docs drawn from a small phrase pool => many low-hamming pairs
    rng = np.random.RandomState(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    rows = [(i, " ".join(vocab[j] for j in rng.randint(0, 10, size=12)))
            for i in range(1000)]
    fps = {r.doc_id: np.uint64(r.simhash & 0xFFFFFFFFFFFFFFFF)
           for r in dedup.simhash(_docs(spark, rows)).collect()}
    ids = sorted(fps)
    arr = np.array([fps[i] for i in ids], dtype=np.uint64)
    xor = arr[:, None] ^ arr[None, :]
    ham = np.zeros_like(xor, dtype=np.int64)
    for b in range(64):
        ham += ((xor >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
    ii, jj = np.where(np.triu(ham <= 3, k=1))
    expected = {(ids[a], ids[b]) for a, b in zip(ii, jj)}
    # cap high enough that no bucket is dropped: recall must be total
    got = {(r.doc_a, r.doc_b) for r in dedup.simhash_near_pairs(
        _docs(spark, rows), max_bucket=10_000).collect()}
    assert got == expected and expected


def test_minhash_digest_budget_guard():
    # two md5s carve exactly eight 32-bit slices; n_hashes=9+ would
    # silently substring past the digest end into '' sig columns
    with pytest.raises(ValueError):
        dedup.minhash_signatures(None, n_hashes=9)
    with pytest.raises(ValueError):
        dedup.minhash_signatures(None, n_hashes=16)


def test_simhash_banding_guard():
    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(None, max_hamming=4, n_chunks=4)
    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(None, max_hamming=8, n_chunks=8)


# --------------------------------------------------------- hot-bucket cap


def test_hot_bucket_capped_no_quadratic_blowup(spark):
    # 1000 identical docs: every band bucket has size 1000 >> MAX_BUCKET,
    # so the candidate join must see nothing (not 499500 pairs) ...
    text = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    hot = _docs(spark, [(i, text) for i in range(1000)])
    assert dedup.minhash_candidates(hot).count() == 0
    assert dedup.simhash_near_pairs(hot).count() == 0
    # ... while exact dedup still collapses the whole group
    [grp] = dedup.exact(hot).collect()
    assert grp.n_dups == 1000 and grp.keeper_doc_id == 0


def test_cap_keeps_small_buckets(spark):
    rows = [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"),
            (3, "zz yy xx ww vv")]
    got = {(r.doc_a, r.doc_b)
           for r in dedup.minhash_candidates(_docs(spark, rows)).collect()}
    assert got == {(1, 2)}


# -------------------------------------------------------- hyperplane LSH


def test_near_dup_pairs_hot_label_capped(spark):
    # one degenerate label holding 300 identical vectors must not
    # produce 300²/2 pairs — the bucket is dropped (hyperplane LSH is
    # the label-free recovery path); a small label still matches
    rows = [(i, [1.0, 0.0, 0.0], 1) for i in range(300)]
    rows += [(1000, [0.0, 1.0, 0.0], 2), (1001, [0.0, 1.0, 0.0], 2)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {(r.vec_a, r.vec_b)
           for r in simsearch.near_dup_pairs(df, 0.9,
                                             max_bucket=200).collect()}
    assert got == {(1000, 1001)}


def test_hyperplane_near_dups_matches_numpy_twin(spark):
    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 16))
    # add near-duplicates of the first 10 rows
    dups = base[:10] + 0.05 * rng.standard_normal((10, 16))
    vecs = np.vstack([base, dups])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = simsearch.hyperplanes(16, 16)
    got = {(r.vec_a, r.vec_b): r.cosine
           for r in simsearch.hyperplane_near_dups(
               df, 0.9, planes=planes).collect()}

    # numpy twin of the same banding + threshold — float32 first, like
    # the parquet column the operator reads
    v = vecs.astype(np.float32).astype(np.float64)
    p = np.array(planes)
    bits = (v @ p.T >= 0).astype(int)  # (n, 16)
    keys = ["".join(map(str, row)) for row in bits]
    expected = {}
    n = len(v)
    norms = np.sqrt((v * v).sum(axis=1))
    for a in range(n):
        for b in range(a + 1, n):
            share = any(keys[a][4 * k:4 * k + 4] == keys[b][4 * k:4 * k + 4]
                        for k in range(4))
            if not share:
                continue
            cos = round(float(v[a] @ v[b] / (norms[a] * norms[b])), 6)
            if cos >= 0.9:
                expected[(a, b)] = cos
    assert set(got) == set(expected) and expected
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9


def test_hyperplane_planes_deterministic():
    assert simsearch.hyperplanes(8, 4) == simsearch.hyperplanes(8, 4)
    assert simsearch.hyperplanes(8, 4) != simsearch.hyperplanes(8, 4, seed=8)


# ------------------------------------------------------------- kmeans IVF


SF001 = "/root/testdata/sf0.001"


def test_kmeans_cells_deterministic(spark):
    emb = spark.read.parquet(SF001 + "/embeddings.parquet")
    c1 = simsearch.kmeans_cells(emb, n_cells=8, sample=256)
    c2 = simsearch.kmeans_cells(emb, n_cells=8, sample=256)
    assert c1 == c2
    assert len(c1) == 8
    # spherical: every centroid is unit-norm
    for c in c1:
        assert abs(np.linalg.norm(c) - 1.0) < 1e-9


def test_assign_cells_matches_numpy(spark):
    emb = spark.read.parquet(SF001 + "/embeddings.parquet")
    cents = simsearch.kmeans_cells(emb, n_cells=8, sample=256)
    got = {r.vec_id: r.cell
           for r in simsearch.assign_cells(emb, cents).collect()}
    C = np.array(cents)
    for r in emb.collect():
        want = int(np.argmax(C @ np.asarray(r.embedding, dtype=np.float64)))
        assert got[r.vec_id] == want


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """Probing 6 of 8 learned cells recovers most of the true top-10
    (and always the query itself), scoring only a fraction of the table.

    The synthetic embeddings have no cluster structure around this
    query (true neighbors sit at cosine ≈ 0.3), so recall is ≈ the
    probed fraction — measured 0.5 at 4/8 probes, 0.8 at 6/8, exactly
    IVF's honest floor on unstructured queries; clustered data is
    where fewer probes suffice."""
    emb = spark.read.parquet(SF001 + "/embeddings.parquet").cache()
    row = emb.where("vec_id = 0").first()
    query = [float(x) for x in row.embedding]

    truth = [r.vec_id for r in
             simsearch.cosine_topk(emb, query, 10).collect()]
    cents = simsearch.kmeans_cells(emb, n_cells=8, sample=512)
    approx = [r.vec_id for r in simsearch.ivf_kmeans_topk(
        emb, query, 10, n_cells=8, n_probe=6, centroids=cents).collect()]

    assert approx[0] == 0  # the query row itself, cosine 1.0
    recall = len(set(truth) & set(approx)) / 10.0
    assert recall >= 0.7, (recall, truth, approx)

    # the probe really restricts the scan: the probed subset is a
    # strict fraction of the table
    probed = simsearch.assign_cells(emb, cents).where(
        "cell in (0,1,2,3,4,5,6,7)").count()
    assert probed == emb.count()
    one_cell = simsearch.assign_cells(emb, cents).where("cell = 0").count()
    assert 0 < one_cell < emb.count()
    emb.unpersist()


def _semdedup_numpy(rows, cents, eps, max_cell):
    """Pure-numpy twin of simsearch.semdedup's decision rule."""
    from collections import defaultdict

    C = np.array(cents, dtype=np.float64)
    ids = sorted(r[0] for r in rows)
    by_id = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    X = np.array([by_id[i] for i in ids])
    cell = np.argmax(X @ C.T, axis=1)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    ccos = np.round(np.einsum("ij,ij->i", Xn, C[cell]), 6)
    keep = {i: True for i in ids}
    members = defaultdict(list)
    for idx in range(len(ids)):
        members[int(cell[idx])].append(idx)
    for idxs in members.values():
        if len(idxs) > max_cell:
            continue
        for ai in idxs:
            for bi in idxs:
                if ai == bi:
                    continue
                earlier = (ccos[ai] < ccos[bi]
                           or (ccos[ai] == ccos[bi]
                               and ids[ai] < ids[bi]))
                if earlier and round(float(Xn[ai] @ Xn[bi]), 6) >= eps:
                    keep[ids[bi]] = False
    return {ids[k]: (int(cell[k]), keep[ids[k]])
            for k in range(len(ids))}


def test_semdedup_matches_numpy_twin(spark):
    emb = spark.read.parquet(SF001 + "/embeddings.parquet").cache()
    cents = simsearch.kmeans_cells(emb, n_cells=8)
    got = {r.vec_id: (r.cell, r.keep)
           for r in simsearch.semdedup(emb, eps=0.4,
                                       centroids=cents).collect()}
    rows = [(r.vec_id, r.embedding) for r in emb.collect()]
    want = _semdedup_numpy(rows, cents, 0.4, 1024)
    assert got == want
    # non-vacuous: the 0.4 threshold actually drops something here
    assert any(not k for _, k in got.values())
    # hot-cell exemption: cap below every cell size keeps everything
    all_keep = simsearch.semdedup(emb, eps=0.4, max_cell=1,
                                  centroids=cents).collect()
    assert all(r.keep for r in all_keep)
    assert len(all_keep) == emb.count()
    emb.unpersist()


# ----------------------------------------------------- duplicate clusters


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_dup_clusters_components_and_sizes(spark):
    # a 6-node path (worst diameter per edge count), a triangle, and
    # isolated docs — canonical is the component min, singletons keep
    # their own id
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
                           (20, 21), (21, 22), (20, 22)])
    docs = _docs(spark, [(i, "d") for i in
                         [0, 1, 2, 3, 4, 5, 20, 21, 22, 100, 101]])
    want = {
        0: (0, 6), 1: (0, 6), 2: (0, 6), 3: (0, 6), 4: (0, 6), 5: (0, 6),
        20: (20, 3), 21: (20, 3), 22: (20, 3),
        100: (100, 1), 101: (101, 1)}
    # both execution paths of the hybrid must agree exactly: the driver
    # union-find fast path (default) and the distributed min-label loop
    # (forced with driver_max_edges=0)
    for kw in ({}, {"driver_max_edges": 0}):
        got = {r.doc_id: (r.canonical_doc_id, r.cluster_size)
               for r in dedup.dup_clusters(docs, pairs, **kw).collect()}
        assert got == want


def test_dup_clusters_empty_pairs_is_identity(spark):
    docs = _docs(spark, [(1, "a"), (2, "b")])
    pairs = _pairs(spark, [])
    got = {r.doc_id: (r.canonical_doc_id, r.cluster_size)
           for r in dedup.dup_clusters(docs, pairs).collect()}
    assert got == {1: (1, 1), 2: (2, 1)}


def test_dup_clusters_long_chain_converges_in_log_rounds(spark):
    # pointer jumping: a 64-node path must converge well inside
    # O(log diameter) rounds, not the O(diameter) of plain propagation
    n = 64
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    docs = _docs(spark, [(i, "d") for i in range(n)])
    out = dedup.dup_clusters(docs, pairs, max_iter=10,
                             driver_max_edges=0).collect()
    assert all(r.canonical_doc_id == 0 and r.cluster_size == n
               for r in out)


def test_dup_clusters_nonconvergence_raises(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(16)])
    docs = _docs(spark, [(i, "d") for i in range(17)])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(docs, pairs, max_iter=1, driver_max_edges=0)


def test_dup_clusters_hybrid_threshold_falls_back(spark):
    # an edge list one past driver_max_edges must take the distributed
    # path and still produce the identical clustering
    pairs = _pairs(spark, [(0, 1), (1, 2), (3, 4)])
    docs = _docs(spark, [(i, "d") for i in range(5)])
    got = {r.doc_id: (r.canonical_doc_id, r.cluster_size)
           for r in dedup.dup_clusters(docs, pairs,
                                       driver_max_edges=2).collect()}
    assert got == {0: (0, 3), 1: (0, 3), 2: (0, 3),
                   3: (3, 2), 4: (3, 2)}


def test_dup_clusters_hybrid_random_graph_paths_agree(spark):
    import random
    rng = random.Random(7)
    n = 200
    pairs = _pairs(spark, [(rng.randrange(n), rng.randrange(n))
                           for _ in range(150)])
    docs = _docs(spark, [(i, "d") for i in range(n)])
    fast = sorted(map(tuple, dedup.dup_clusters(
        docs, pairs).collect()))
    dist = sorted(map(tuple, dedup.dup_clusters(
        docs, pairs, driver_max_edges=0).collect()))
    assert fast == dist


def test_dup_clusters_ignores_foreign_pair_ids_on_both_paths(spark):
    # pairs referencing ids absent from docs must not inflate cluster
    # sizes — and the two execution paths must agree on the result
    docs = _docs(spark, [(0, "d"), (1, "d")])
    pairs = _pairs(spark, [(0, 1), (1, 99), (99, 98)])  # 98/99 foreign
    want = {0: (0, 2), 1: (0, 2)}
    for kw in ({}, {"driver_max_edges": 0}):
        got = {r.doc_id: (r.canonical_doc_id, r.cluster_size)
               for r in dedup.dup_clusters(docs, pairs, **kw).collect()}
        assert got == want, kw


def test_dup_clusters_driver_path_is_type_agnostic(spark):
    # string ids (e.g. urls) through the driver union-find fast path
    docs = spark.createDataFrame(
        [("u/a",), ("u/b",), ("u/c",)], "doc_id string")
    pairs = spark.createDataFrame(
        [("u/b", "u/a")], "doc_a string, doc_b string")
    got = {r.doc_id: (r.canonical_doc_id, r.cluster_size)
           for r in dedup.dup_clusters(docs, pairs).collect()}
    assert got == {"u/a": ("u/a", 2), "u/b": ("u/a", 2),
                   "u/c": ("u/c", 1)}


# ------------------------------------------------- exact shared substrings


def test_shared_substring_pairs_planted_span(spark):
    span = "".join(chr(ord("a") + (i * 7) % 26) for i in range(40))
    assert len(set(span[i:i + 32] for i in range(9))) == 9
    # distinct chars flank the span so the shared region is EXACTLY it
    docs = _docs(spark, [
        (0, "prefix zero." + span + ".tail of zero"),
        (1, "totally different lead-in," + span + ",other ending"),
        (2, "no overlap with anything else at all, long filler text"),
    ])
    rows = dedup.shared_substring_pairs(docs, n_chars=32,
                                        min_shared=2).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(0, 1)]
    # a 40-char shared span yields exactly 40-32+1 distinct shared grams
    assert rows[0].n_shared == 9


def test_shared_substring_hot_gram_capped(spark):
    # 200 identical boilerplate docs: every gram bucket blows the cap
    # and is dropped -- no quadratic pair explosion, no output (exact
    # dedup is the recovery path for that mass, like the LSH siblings)
    boiler = "this exact license header appears on every page " * 2
    docs = _docs(spark, [(i, boiler) for i in range(200)])
    pairs = dedup.shared_substring_pairs(docs, n_chars=32, min_shared=1,
                                         max_bucket=50)
    assert pairs.count() == 0


def test_shared_substring_gram_frac_content_defined(spark):
    # the hex-prefix selector keeps/drops a gram identically in both
    # docs (content-defined), so a long planted span still surfaces
    span = "".join(chr(ord("a") + (i * 11) % 26) for i in range(200))
    docs = _docs(spark, [
        (0, "first document carries " + span),
        (1, span + " trailed by second document"),
    ])
    exact = dedup.shared_substring_pairs(docs, min_shared=1).collect()
    sampled = dedup.shared_substring_pairs(docs, min_shared=1,
                                           gram_frac=4).collect()
    assert [(r.doc_a, r.doc_b) for r in sampled] == [(0, 1)]
    # the selector only ever removes grams
    assert sampled[0].n_shared <= exact[0].n_shared
    with pytest.raises(ValueError):
        dedup.shared_substring_pairs(docs, gram_frac=3)


def _py_shared_pairs(texts, n, min_shared, cap):
    from collections import defaultdict
    buckets = defaultdict(list)
    for d, t in texts.items():
        for g in set(t[i:i + n] for i in range(max(len(t) - n + 1, 0))):
            buckets[g].append(d)
    pairs = defaultdict(int)
    for ds in buckets.values():
        if len(ds) <= cap:
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    pairs[(ds[i], ds[j])] += 1
    return {p: c for p, c in pairs.items() if c >= min_shared}


@pytest.mark.parametrize("seed", range(4))
def test_shared_substring_pairs_random_twin(spark, seed):
    # random corpora with deliberate splices: Spark pipeline == the
    # direct python definition (gram -> capped buckets -> pair counts)
    import random
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "longsharedword"]
    texts = {}
    for d in range(24):
        texts[d] = " ".join(rng.choice(vocab)
                            for _ in range(rng.randint(3, 30)))
    for d in range(24, 30):  # splice: head of one doc + tail of another
        a, b = rng.randrange(24), rng.randrange(24)
        texts[d] = texts[a][:len(texts[a]) // 2] + texts[b][len(texts[b]) // 2:]
    docs = _docs(spark, sorted(texts.items()))
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in dedup.shared_substring_pairs(
               docs, n_chars=16, min_shared=1, max_bucket=8).collect()}
    assert got == _py_shared_pairs(texts, 16, 1, 8)


def _py_winnow_grams(text, n, w):
    import hashlib
    g = [hashlib.md5(text[i:i + n].encode()).hexdigest()
         for i in range(max(len(text) - n + 1, 0))]
    if not g:
        return set()
    return {min(g[p:p + w]) for p in range(max(len(g) - w + 1, 1))}


@pytest.mark.parametrize("seed", range(6))
def test_winnow_guarantee_and_python_twin(spark, seed):
    # any shared span of length >= n_chars + winnow - 1 MUST surface
    # (Schleimer et al. 2003 guarantee), and the selected-gram pair
    # counts equal the direct python winnowing on every doc pair
    import random
    rng = random.Random(seed)
    n, w = 12, 5
    span = "".join(rng.choice("abcdefghij") for _ in range(n + w - 1))
    def flank(k):
        return "".join(rng.choice("qrstuvwxyz") for _ in range(k))
    texts = {0: flank(rng.randint(0, 40)) + span + flank(rng.randint(0, 40)),
             1: flank(rng.randint(0, 40)) + span + flank(rng.randint(0, 40)),
             2: flank(60)}
    docs = _docs(spark, sorted(texts.items()))
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in dedup.shared_substring_pairs(
               docs, n_chars=n, min_shared=1, winnow=w,
               max_bucket=100).collect()}
    assert (0, 1) in got                      # the guarantee
    want = {}
    sel = {d: _py_winnow_grams(t, n, w) for d, t in texts.items()}
    for a in texts:
        for b in texts:
            if a < b and sel[a] & sel[b]:
                want[(a, b)] = len(sel[a] & sel[b])
    assert got == want                        # exact twin equality


def test_winnow_short_doc_keeps_global_min(spark):
    # a doc with fewer grams than one window still fingerprints (its
    # global min), so tiny exact dups are not silently invisible
    docs = _docs(spark, [(0, "abcdefghijklm"), (1, "abcdefghijklm")])
    got = dedup.shared_substring_pairs(docs, n_chars=12, min_shared=1,
                                       winnow=50).collect()
    assert [(r.doc_a, r.doc_b, r.n_shared) for r in got] == [(0, 1, 1)]
    with pytest.raises(ValueError):
        dedup.shared_substring_pairs(docs, winnow=0)
    with pytest.raises(ValueError):
        dedup.shared_substring_pairs(docs, winnow=4, gram_frac=4)


def test_minhash_delta_incremental_invariant(spark):
    # candidates(old ∪ new) == candidates(old) ∪ delta(new, bands(old))
    # when no bucket crosses the cap between increments — the invariant
    # that makes per-increment dedup sound at crawl scale
    rows = [(i, "w%d x%d y%d common suffix tokens here"
             % (i % 6, i % 4, i % 3)) for i in range(80)]
    every = _docs(spark, rows)
    old = every.where("doc_id % 2 = 1")
    new = every.where("doc_id % 2 = 0")
    full = {(r.doc_a, r.doc_b) for r in
            dedup.minhash_candidates(every, max_bucket=10_000).collect()}
    prior = {(r.doc_a, r.doc_b) for r in
             dedup.minhash_candidates(old, max_bucket=10_000).collect()}
    delta = {(r.doc_a, r.doc_b): r.vs_index
             for r in dedup.minhash_candidates_delta(
                 new, dedup.minhash_bands(old),
                 max_bucket=10_000).collect()}
    assert prior | set(delta) == full
    assert prior.isdisjoint(delta)           # no re-emission
    assert full                              # non-vacuous
    new_ids = {i for i, _ in rows if i % 2 == 0}
    for (a, b), vs_index in delta.items():
        # every delta pair touches the new batch; the flag marks
        # exactly the new-vs-index pairs
        assert a in new_ids or b in new_ids
        assert vs_index == ((a in new_ids) != (b in new_ids))


def test_minhash_delta_reingestion_no_self_pairs(spark):
    # a doc present in BOTH the index and the new batch (retry after a
    # partial failure) collides with its own index bands in every band
    # -- it must not pair with itself
    rows = [(i, "alpha beta gamma delta %d" % (i % 2)) for i in range(6)]
    every = _docs(spark, rows)
    got = dedup.minhash_candidates_delta(
        every.where("doc_id = 0"),                # re-ingested doc
        dedup.minhash_bands(every),               # index already has it
        max_bucket=10_000).collect()
    assert all(r.doc_a != r.doc_b for r in got)
    # it still pairs with its true near-dups in the index
    assert {(r.doc_a, r.doc_b) for r in got} == {(0, 2), (0, 4)}
    # double-emission guard: a near-dup pair WITHIN the batch whose
    # endpoint is also indexed must emit exactly one row, flagged as
    # intra-batch (vs_index=false) — not one row per join arm
    got2 = dedup.minhash_candidates_delta(
        every.where("doc_id IN (0, 2)"),          # both new, near-dups
        dedup.minhash_bands(every.where("doc_id = 0")),  # 0 re-ingested
        max_bucket=10_000).collect()
    assert [(r.doc_a, r.doc_b, r.vs_index) for r in got2] == [(0, 2, False)]


def test_hard_negatives_matches_numpy_twin(spark):
    rng = np.random.RandomState(5)
    base = rng.standard_normal((30, 16))
    dups = base[:8] + 0.01 * rng.standard_normal((8, 16))  # near-dups
    vecs = np.vstack([base, dups])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = simsearch.hyperplanes(16, 16)
    K, DUP = 3, 0.98
    got = {}
    for r in simsearch.hard_negatives(df, k=K, dup_threshold=DUP,
                                      planes=planes).collect():
        got.setdefault(r.anchor_id, []).append(
            (r.rank, r.neg_id, r.cosine))

    v = vecs.astype(np.float32).astype(np.float64)
    p = np.array(planes)
    bits = (v @ p.T >= 0).astype(int)
    keys = ["".join(map(str, row)) for row in bits]
    norms = np.sqrt((v * v).sum(axis=1))
    n = len(v)
    expected = {}
    for a in range(n):
        cands = []
        for b in range(n):
            if a == b:
                continue
            share = any(keys[a][4 * j:4 * j + 4] == keys[b][4 * j:4 * j + 4]
                        for j in range(4))
            if not share:
                continue
            cos = round(float(v[a] @ v[b] / (norms[a] * norms[b])), 6)
            if cos < DUP:
                cands.append((-cos, b))
        cands.sort()
        if cands:
            expected[a] = [(i + 1, b, -negcos)
                           for i, (negcos, b) in enumerate(cands[:K])]
    assert set(got) == set(expected) and expected
    for a in expected:
        assert sorted(got[a]) == [(r, b, round(c, 6))
                                  for r, b, c in expected[a]], a
    # near-dups excluded: a planted dup pair must never be a negative
    for a, negs in got.items():
        for _, b, c in negs:
            assert c < DUP


def test_hard_negatives_k_and_direction(spark):
    # directed: anchor 0 gets negatives even when its id is smallest;
    # k caps the list per anchor
    rows = [(i, [1.0, float(i) * 0.01]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = simsearch.hyperplanes(2, 8)
    out = simsearch.hard_negatives(df, k=2, dup_threshold=1.1,
                                   planes=planes)
    counts = {r[0]: r[1] for r in
              out.groupBy("anchor_id").count().collect()}
    assert counts and all(c <= 2 for c in counts.values())
    assert 0 in counts  # smallest id still anchors
