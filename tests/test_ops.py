"""Unit tests for training-data ops: hashing parity, dedup, similarity
recall, text stats."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (2, "the quick brown fox jumps over a lazy dog"),     # near dup
        (3, "spark sql window functions and joins"),
        (4, "der hund und das haus ist der ort"),
        (5, "el gato es de los perros"),
        (6, "one"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_h60_spark_matches_python(spark):
    from cuely_spark.ops.hashing import h60_py, h60_spark

    df = spark.createDataFrame([("hello world",), ("café",), ("",)],
                               "s string")
    got = df.select(h60_spark(F.col("s")).alias("h")).collect()
    exp = [h60_py(s) for s in ["hello world", "café", ""]]
    assert [r["h"] for r in got] == exp


def test_exact_duplicates(spark, docs_df):
    from cuely_spark.ops.dedup import exact_duplicates

    rows = exact_duplicates(docs_df).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2 and rows[0]["min_doc_id"] == 0


def test_minhash_signatures_match_python(spark, docs_df):
    from cuely_spark.ops.dedup import minhash_signatures
    from cuely_spark.ops.hashing import h60_py

    got = {r["doc_id"]: [r[f"mh_{i}"] for i in range(4)]
           for r in minhash_signatures(docs_df, num_hashes=4).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    for did, text in texts.items():
        toks = text.split()
        if len(toks) >= 3:
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        exp = [min(h60_py(f"{i}|{s}") for s in sh) for i in range(4)]
        assert got[did] == exp, did


def test_minhash_lsh_finds_near_dup(spark, docs_df):
    from cuely_spark.ops.dedup import minhash_lsh_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(docs_df, threshold=0.4).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert all(j >= 0.4 for j in pairs.values())


def test_ngram_jaccard(spark, docs_df):
    from cuely_spark.ops.dedup import ngram_jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs_df, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # near dup above 0.3
    assert (0, 3) not in pairs


def test_simhash_near_for_near_dups(spark, docs_df):
    from cuely_spark.ops.dedup import simhash

    got = {r["doc_id"]: r["simhash"]
           for r in simhash(docs_df, bits=32).collect()}
    ham01 = bin(got[0] ^ got[1]).count("1")
    ham02 = bin(got[0] ^ got[2]).count("1")
    ham03 = bin(got[0] ^ got[3]).count("1")
    assert ham01 == 0            # identical text -> identical sketch
    assert ham02 < ham03         # near dup closer than unrelated


def test_knn_pandas_matches_jvm(spark):
    from cuely_spark.ops.similarity import cosine_scores, knn_bruteforce_pandas

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0)
         .first()["embedding"]]
    jvm = cosine_scores(emb, q).orderBy(F.desc("cosine"), "vec_id") \
        .limit(10).collect()
    pnd = knn_bruteforce_pandas(emb, q, k=10).collect()
    assert [r["vec_id"] for r in jvm] == [r["vec_id"] for r in pnd]
    np.testing.assert_allclose([r["cosine"] for r in jvm],
                               [r["cosine"] for r in pnd], atol=2e-6)


def test_ann_recall(spark):
    from cuely_spark.ops.similarity import (
        ivf_knn,
        knn_bruteforce_pandas,
        lsh_knn,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7)
         .first()["embedding"]]
    exact_rows = knn_bruteforce_pandas(emb, q, k=10).collect()
    exact = {r["vec_id"] for r in exact_rows}
    lsh_rows = lsh_knn(emb, q, k=10, nbits=4).collect()
    ivf_rows = ivf_knn(emb, q, k=10, ncells=8, nprobe=4).collect()
    lsh = {r["vec_id"] for r in lsh_rows}
    ivf = {r["vec_id"] for r in ivf_rows}
    assert 7 in lsh and 7 in ivf        # the query point itself
    # candidates are scored exactly: cosines must match brute force and
    # be sorted descending
    exact_cos = {r["vec_id"]: r["cosine"] for r in
                 knn_bruteforce_pandas(emb, q, k=500).collect()}
    for rows in (lsh_rows, ivf_rows):
        cs = [r["cosine"] for r in rows]
        assert cs == sorted(cs, reverse=True)
        for r in rows:
            assert abs(r["cosine"] - exact_cos[r["vec_id"]]) < 2e-6
    # weakly-clustered random embeddings: expect modest but real recall
    assert len(exact & lsh) >= 2
    assert len(exact & ivf) >= 2


def test_quality_and_langid(spark, docs_df):
    from cuely_spark.ops.textstats import lang_id, quality_score, token_stats

    ts = {r["doc_id"]: r for r in token_stats(docs_df).collect()}
    assert ts[6]["n_tokens"] == 1 and ts[6]["n_chars"] == 3
    assert ts[0]["n_tokens"] == 9

    qs = {r["doc_id"]: r for r in quality_score(docs_df).collect()}
    assert qs[0]["stopword_ratio"] == pytest.approx(2 / 9)
    assert 0 <= qs[0]["quality"] <= 1
    # a 1-token doc is gated low by length regardless of cleanliness
    assert qs[6]["quality"] < qs[3]["quality"]
    assert qs[6]["quality"] < 0.05

    lang = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs_df).collect()}
    assert lang[0] == "en" and lang[4] == "de" and lang[5] == "es"
    assert lang[6] == "und"


def test_fingerprint_stable_under_distant_edit(spark):
    from cuely_spark.ops.textstats import fingerprint

    rows = [(0, "a b c d e f g h i j"),
            (1, "a b c d e f g h i CHANGED"),
            (2, "completely different words here now ok yes sure fine")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: r["fingerprint"]
          for r in fingerprint(df, k=5).collect()}
    # doc 1 changed only the tail; the minimal 5-gram may survive
    assert fp[0] != fp[2]
    assert isinstance(fp[0], int)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # planted near-dups: tiny perturbations of vectors 0 and 3
    for j, src in enumerate((0, 3)):
        pert = base[src] + rng.normal(scale=0.01, size=16)
        rows.append((100 + j, [float(x) for x in pert]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dup_lsh_subset_of_exact_and_no_cartesian(
        spark, emb_df):
    """LSH-banded pairs are a subset of the brute-force pairs with
    identical cosines, find the planted near-dups, and the plan has no
    CartesianProduct (the 100-TB criterion)."""
    from cuely_spark.ops.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )

    lsh = embedding_near_dup_pairs(emb_df, threshold=0.9,
                                   bands=8, band_bits=4)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in lsh.collect()}
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs_exact(
                 emb_df, threshold=0.9).collect()}
    assert set(got) <= set(exact)
    for k_, v in got.items():
        assert v == exact[k_]
    # planted perturbation pairs must be recalled at these settings
    assert (0, 100) in got and (3, 101) in got


def test_simhash_near_dup_pairs_exact_vs_bruteforce(spark, docs_df):
    """Banded simhash pairs == brute-force hamming<=h pairs (pigeonhole
    exactness when max_hamming < bands)."""
    from cuely_spark.ops.dedup import simhash, simhash_near_dup_pairs

    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_dup_pairs(
               docs_df, bits=60, bands=4, max_hamming=3).collect()}
    sims = {r["doc_id"]: r["simhash"]
            for r in simhash(docs_df, bits=60).collect()}
    ids = sorted(sims)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hd = bin(sims[a] ^ sims[b]).count("1")
            if hd <= 3:
                exp[(a, b)] = hd
    assert got == exp
    assert (0, 1) in got and got[(0, 1)] == 0  # exact dup -> hamming 0


def test_persisted_ann_indexes_match_onthefly(spark, emb_df, tmp_path):
    """Persisted LSH/IVF indexes return exactly the on-the-fly results
    (same deterministic models), and a probe reads only the probed
    partitions (partition pruning on the bucket/cell directory)."""
    from cuely_spark.ops import ann_index, similarity

    qv = [float(x) for x in
          emb_df.filter("vec_id = 0").first()["embedding"]]
    lsh_root = str(tmp_path / "lsh_idx")
    ann_index.build_lsh_index(emb_df, lsh_root, nbits=6)
    got = ann_index.lsh_index_search(spark, lsh_root, qv, k=5).collect()
    exp = similarity.lsh_knn(emb_df, qv, k=5, nbits=6).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
        [(r["vec_id"], r["cosine"]) for r in exp]
    # pruning: probed files strictly fewer than the index's files
    import os
    all_files = sum(len(files) for _, _, files in
                    os.walk(os.path.join(lsh_root, "vectors"))
                    if any(f.endswith(".parquet") for f in files))
    probed = ann_index.lsh_index_search(spark, lsh_root, qv, k=5)
    touched = len(probed.inputFiles())
    assert 0 < touched < all_files

    ivf_root = str(tmp_path / "ivf_idx")
    ann_index.build_ivf_index(emb_df, ivf_root, ncells=4, iters=5)
    got = ann_index.ivf_index_search(spark, ivf_root, qv, k=5,
                                     nprobe=2).collect()
    exp = similarity.ivf_knn(emb_df, qv, k=5, ncells=4, nprobe=2,
                             iters=5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
        [(r["vec_id"], r["cosine"]) for r in exp]


def test_near_dup_clusters_and_canonical(spark):
    """Connected components over pairs: transitive chains collapse to
    one cluster keyed by the min id; canonical_docs keeps one per
    cluster plus all unpaired docs."""
    from cuely_spark.ops.dedup import canonical_docs, near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)],  # {1,2,3,9} and {5,6}
        "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(11)],
                                 "doc_id long, text string")
    kept = {r["doc_id"] for r in
            canonical_docs(docs, near_dup_clusters(pairs)).collect()}
    assert kept == {0, 1, 4, 5, 7, 8, 10}


def test_ngram_lsh_subset_of_quadratic_and_no_cartesian(spark, docs_df):
    """The gated low-threshold n-gram path (minhash_lsh_pairs with wide
    banding) returns a subset of the quadratic exact-jaccard baseline
    with identical jaccard values, recalls the planted dups, and its
    plan has no cartesian/nested-loop join (the 100-TB criterion). The
    quadratic ngram_jaccard_pairs stays pytest-only — never gated."""
    from cuely_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    lsh = minhash_lsh_pairs(docs_df, num_hashes=32, bands=16,
                            threshold=0.12)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in lsh.collect()}
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs_df,
                                          threshold=0.12).collect()}
    assert set(got) <= set(exact)
    for pair, v in got.items():
        assert v == exact[pair]
    assert (0, 1) in got and got[(0, 1)] == 1.0   # exact dup
    assert (0, 2) in got                          # near dup recalled


def test_gated_dedup_plans_are_bucketed(spark, docs_df, emb_df):
    """Every pair-generating dedup op behind a driver gate must run a
    bucketed (band-join) plan — no cartesian/nested-loop anywhere."""
    from cuely_spark.ops.dedup import (
        embedding_near_dup_pairs,
        minhash_lsh_pairs,
        simhash_near_dup_pairs,
    )

    gated = [
        minhash_lsh_pairs(docs_df, threshold=0.8),
        minhash_lsh_pairs(docs_df, num_hashes=32, bands=16,
                          threshold=0.12),
        simhash_near_dup_pairs(docs_df, bits=60, bands=4, max_hamming=3),
        embedding_near_dup_pairs(emb_df, threshold=0.5, bands=16,
                                 band_bits=2),
    ]
    for df in gated:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_band_pairs_hot_bucket_split_is_exact(spark):
    """Skew guard: with a pathological corpus where EVERY id lands in
    the same band bucket, the chunk-split path must (a) produce exactly
    the naive all-pairs output (the split redistributes work, never
    drops), (b) key the join on (bucket, chunk, chunk) so no single
    task owns |bucket|^2 work, (c) stay CartesianProduct-free."""
    from cuely_spark.ops.dedup import _band_pairs

    n = 24
    bandvals = spark.createDataFrame(
        [(i, (0, 42)) for i in range(n)],
        "id long, bk struct<band:int,val:long>")
    split = _band_pairs(bandvals, "a", "b", max_bucket=4)
    got = {(r["a"], r["b"]) for r in split.collect()}
    want = {(i, j) for i in range(n) for j in range(i + 1, n)}
    assert got == want

    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "__t1" in plan and "__t2" in plan  # chunk-pair join keys

    # normal-sized buckets: single chunk, output unchanged
    one = _band_pairs(bandvals, "a", "b", max_bucket=4096)
    assert {(r["a"], r["b"]) for r in one.collect()} == want


def test_minhash_verify_join_no_cartesian(spark, docs_df):
    """The shingle-equality verification join must never be a per-pair
    cross product (the equality is IN the join condition)."""
    from cuely_spark.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs_df, threshold=0.3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # near-dup pair (0,1 exact; 2 near) still found through the split path
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (0, 1) in got


def test_ivf_sample_unbiased_beats_id_ordered(spark, monkeypatch):
    """Id-clustered corpus: the lowest ids are one tight direction
    cluster (one shard / time-slice at scale), the true neighbors of
    the query live in the high-id region. An id-ordered training sample
    sees ONLY the low-id cluster, so the trained cells cannot separate
    the high-id region and probe recall collapses; the md5-ordered
    sample is uniform over ids and recovers the true top-k."""
    import cuely_spark.ops.similarity as sim

    rng = np.random.default_rng(3)
    dim, n_low, n_high = 16, 200, 200
    base_low = rng.normal(size=dim)
    rows = []
    for i in range(n_low):  # ids 0..199: tight cluster around base_low
        v = base_low + 0.01 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    for i in range(n_high):  # ids 200..399: diverse directions
        v = rng.normal(size=dim)
        rows.append((n_low + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    # query near a specific high-id vector
    target = np.array(rows[n_low + 57][1])
    query = target + 0.001 * rng.normal(size=dim)

    exact = [r["vec_id"] for r in
             sim.knn_bruteforce(emb, query, k=10).collect()]

    monkeypatch.setattr(sim, "IVF_SAMPLE_CAP", n_low)  # cap < corpus

    got_md5 = [r["vec_id"] for r in
               sim.ivf_knn(emb, query, k=10, ncells=8, nprobe=2)
               .collect()]
    recall_md5 = len(set(got_md5) & set(exact)) / 10

    def id_ordered_sample(e, vec_col, id_col):
        return np.stack(
            [r[vec_col] for r in
             e.select(id_col, vec_col).orderBy(id_col)
             .limit(sim.IVF_SAMPLE_CAP).collect()]).astype(np.float64)

    monkeypatch.setattr(sim, "_ivf_sample", id_ordered_sample)
    got_id = [r["vec_id"] for r in
              sim.ivf_knn(emb, query, k=10, ncells=8, nprobe=2)
              .collect()]
    recall_id = len(set(got_id) & set(exact)) / 10

    assert recall_md5 > recall_id
    assert recall_md5 >= 0.8


def test_lsh_knn_max_hamming_recall_monotone(spark):
    """Widening the probe radius (the nprobe knob) can only grow the
    candidate set, so recall vs exact is monotone in max_hamming and
    equals exact at max_hamming = nbits."""
    from cuely_spark.ops import similarity as sim

    rng = np.random.default_rng(9)
    dim, n = 12, 300
    rows = [(i, [float(x) for x in rng.normal(size=dim)])
            for i in range(n)]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    q = rng.normal(size=dim)
    exact = [r["vec_id"] for r in
             sim.knn_bruteforce(emb, q, k=10).collect()]
    nbits = 6
    prev = -1.0
    for h in (0, 1, 2, nbits):
        got = [r["vec_id"] for r in
               sim.lsh_knn(emb, q, k=10, nbits=nbits,
                           max_hamming=h).collect()]
        rec = len(set(got) & set(exact)) / 10
        assert rec >= prev
        prev = rec
    assert prev == 1.0  # full radius == brute force
