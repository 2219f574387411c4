"""Deduplication operators over a documents table — Spark-first.

Scale notes (the point of each design):
- exact_duplicates: one hash-groupBy shuffle on a 60-bit content hash;
  at 100 TB this is the cheapest possible full-corpus dedup (map-side
  partial agg, AQE handles skew of pathological hot hashes).
- minhash_lsh_pairs: shingle -> NUM_HASHES minhashes -> bands; candidate
  generation is a self-join **on (band, band_signature)** so the shuffle
  key space is the band buckets, never the full cross product. Verified
  with exact shingle Jaccard only on candidates (classic MinHash+LSH,
  cf. Broder; reference analog: simhash near-dup table in
  crates/core/src/collector/top_docs.rs + crates/core/src/simhash.rs).
- simhash: 64-ish-bit (60) sign-aggregated token-hash sketch; hamming
  near-dup via band join on it is analogous.
- All hashes are md5-based (ops.hashing) => DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import h60_spark

NUM_MINHASHES = 16
LSH_BANDS = 4  # 4 bands x 4 rows
SHINGLE_K = 3


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, min_doc_id).
    Only groups with >1 doc are returned."""
    from . import spread

    docs = spread(docs, id_col)
    return (
        docs.select(h60_spark(F.col(text_col)).alias("text_hash"),
                    F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"),
             F.min(id_col).alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def _shingles(text_col: str, k: int = SHINGLE_K):
    """Array of k-word shingles of the whitespace-token stream (JVM-side:
    split + transform over a sequence of start offsets)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(
            " ", F.slice(toks, i + 1, k)))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles."""
    from . import spread

    docs = spread(docs, id_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_shingles(text_col, k)).alias("shingle"),
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_hashes: int = NUM_MINHASHES) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}): min over shingles of h60(i || '|' || s).

    Entirely JVM-side: explode shingles once, aggregate num_hashes mins
    in one groupBy pass (map-side combine keeps the shuffle tiny)."""
    sh = doc_shingles(docs, text_col, id_col)
    aggs = [
        F.min(h60_spark(F.concat(F.lit(f"{i}|"), F.col("shingle"))))
        .alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_hashes: int = NUM_MINHASHES,
                      bands: int = LSH_BANDS,
                      threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, jaccard) via MinHash+LSH.

    Candidates = pairs sharing at least one band signature; verified
    with exact shingle Jaccard >= threshold."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  *[c.alias(f"v{r}") for r, c in
                                    enumerate(cols)]).alias(f"band_{b}"))
    banded = sig.select("doc_id", F.explode(F.array(*band_cols))
                        .alias("bk"))
    cand = _band_pairs(banded, "doc_a", "doc_b")
    sh = doc_shingles(docs, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # exact-Jaccard verification: the shingle equality lives IN the join
    # condition (not a post-join filter) so the pair-vs-shingle join can
    # never degrade to a per-pair cross product under a future optimizer
    # regression; assert_no_cartesian in tests pins the plan
    sh_b = sh.select(F.col("doc_id").alias("__doc_b"),
                     F.col("shingle").alias("shingle_b"))
    withed = cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
    inter = (
        withed.join(sh_b, (withed["doc_b"] == sh_b["__doc_b"])
                    & (withed["shingle"] == sh_b["shingle_b"]))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6)
            .alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = SHINGLE_K,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (no LSH): shingle self-join.
    Quadratic in bucket sizes — the exactness baseline for tests; use
    minhash_lsh_pairs at scale."""
    sh = doc_shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select("doc_a", "doc_b",
                F.round(F.col("n_inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                        6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """(doc_id, simhash): sign-aggregated token-hash sketch.

    bit b of simhash = 1 iff sum over tokens of (+1 if bit b of
    h60(token) else -1) > 0. Tokens weighted by frequency (a token
    appearing twice contributes twice) — classic Charikar simhash.
    JVM-side: explode tokens, one groupBy with `bits` conditional sums.
    The input is spread across task slots first (see :func:`..spread`)
    so the per-token md5 map work parallelizes even from a single-file
    scan; keyed by the id so the groupBy reuses that exchange.
    """
    from . import spread

    docs = spread(docs, id_col)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", h60_spark(F.col("tok")))
    aggs = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1,
                     1).otherwise(-1)).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"s{b}") > 0,
                           F.lit(1).cast("long") * (2 ** b)).otherwise(0)
    return sums.select("doc_id", sim.alias("simhash"))


def _banded(df: DataFrame, id_out: str, sig_col: str, bands: int,
            band_bits: int) -> DataFrame:
    """Explode an integer signature into (id, (band, band_value)) rows —
    the LSH bucketing key. JVM-side bit ops only."""
    mask = (1 << band_bits) - 1
    return df.select(
        F.col(df.columns[0]).alias(id_out),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright(F.col(sig_col), b * band_bits)
                     .bitwiseAND(F.lit(mask)).alias("val"))
            for b in range(bands)])).alias("bk"))


#: band buckets above this size are split into chunk-pair tasks
MAX_BAND_BUCKET = 4096


def _band_pairs(bandvals: DataFrame, id_out_a: str, id_out_b: str,
                max_bucket: int = MAX_BAND_BUCKET) -> DataFrame:
    """Distinct id pairs sharing >= 1 (band, value) bucket. The shuffle
    key is the bucket, never the cross product — the 100-TB path.

    Skew guard: a degenerate bucket (boilerplate-heavy corpora where
    thousands of ids share one band signature) would put |bucket|^2
    candidate work into ONE join task. Buckets larger than `max_bucket`
    are split into ceil(n/max_bucket) chunks (deterministic md5-chunk
    assignment) and paired block-nested: a row in chunk c joins tasks
    (c, j>=c) on the A side and (i<=c, c) on the B side, so every chunk
    pair is one task of ~max_bucket^2 work keyed by (bucket, chunk,
    chunk). Output pairs are IDENTICAL to the naive bucket join — the
    split redistributes work, it drops nothing. Normal buckets emit one
    task (chunk 0, 0) — the plan is unchanged for them."""
    idc = bandvals.columns[0]
    counts = bandvals.groupBy("bk").agg(F.count("*").alias("__n"))
    nv = (bandvals.join(counts, "bk")
          .withColumn("__nc", F.ceil(F.col("__n") / F.lit(max_bucket))
                      .cast("int"))
          .withColumn("__c", F.pmod(
              h60_spark(F.col(idc).cast("string")),
              F.col("__nc")).cast("int")))
    a = (nv.select(F.col(idc).alias("__ia"), "bk",
                   F.col("__c").alias("__t1"),
                   F.explode(F.sequence(F.col("__c"),
                                        F.col("__nc") - 1)).alias("__t2")))
    b = (nv.select(F.col(idc).alias("__ib"), "bk",
                   F.explode(F.sequence(F.lit(0),
                                        F.col("__c"))).alias("__t1"),
                   F.col("__c").alias("__t2")))
    return (a.join(b, ["bk", "__t1", "__t2"])
            .filter(F.col("__ia") != F.col("__ib"))
            .select(F.least("__ia", "__ib").alias(id_out_a),
                    F.greatest("__ia", "__ib").alias(id_out_b))
            .distinct())


def _cosine_expr(va, vb):
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    norm = (lambda c: F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v)))
    return dot / (norm(va) * norm(vb))


def embedding_near_dup_pairs(emb: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             threshold: float = 0.95, bands: int = 4,
                             band_bits: int = 8,
                             seed: str = "emb-dedup") -> DataFrame:
    """Near-dup pairs by cosine similarity, LSH-banded (the scale path):
    random-hyperplane signature of bands*band_bits bits, candidates =
    pairs sharing >= 1 band bucket, exact cosine rerank on candidates
    only. Approximate (a pair colliding in no band is missed); the
    brute-force oracle is embedding_near_dup_pairs_exact."""
    from .similarity import lsh_signatures

    sig = lsh_signatures(emb, bands * band_bits, vec_col, id_col, seed)
    cand = _band_pairs(_banded(sig, "vid", "bucket", bands, band_bits),
                       "id_a", "id_b")
    ea = emb.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("va"))
    eb = emb.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).alias("vb"))
    return (cand.join(ea, "id_a").join(eb, "id_b")
            .select("id_a", "id_b",
                    F.round(_cosine_expr(F.col("va"), F.col("vb")), 6)
                    .alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def embedding_near_dup_pairs_exact(emb: DataFrame,
                                   vec_col: str = "embedding",
                                   id_col: str = "vec_id",
                                   threshold: float = 0.95) -> DataFrame:
    """Brute-force cosine near-dup pairs — O(N^2) cartesian; the test
    oracle for the LSH path, never the scale path."""
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(_cosine_expr(F.col("va"), F.col("vb")), 6)
                .alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def simhash_near_dup_pairs(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", bits: int = 16,
                           bands: int = 4,
                           max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with simhash hamming distance <=
    max_hamming, via banded self-join. EXACT when max_hamming < bands:
    <= max_hamming differing bits cannot touch every one of `bands`
    disjoint bit ranges (pigeonhole), so every qualifying pair shares a
    band bucket (the standard hamming-LSH argument; reference sketch:
    crates/core/src/simhash.rs hamming-based dedup)."""
    assert bits % bands == 0 and max_hamming < bands
    sh = simhash(docs, text_col, id_col, bits)
    cand = _band_pairs(_banded(sh, "did", "simhash", bands, bits // bands),
                       "doc_a", "doc_b")
    sa = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("simhash").alias("sim_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("sim_b"))
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def near_dup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                      b_col: str = "doc_b",
                      max_iters: int = 20) -> DataFrame:
    """(doc_id, cluster_id): connected components over near-dup pairs,
    cluster_id = min doc id in the component — the step a dedup pipeline
    runs after pair generation to keep one canonical doc per group.

    Iterative min-label propagation: each round joins current labels
    across the (undirected) edge set and keeps the per-node min;
    converges in O(component diameter) rounds — near-dup components are
    shallow (stars around a canonical), so a handful of rounds in
    practice; `max_iters` bounds pathological chains. Each round is two
    hash shuffles keyed by node id — no driver materialization beyond a
    1-row convergence check. (The Kiveris et al. large-star/small-star
    optimization drops in here if trillion-edge graphs ever appear.)
    """
    edges = (pairs.select(F.col(a_col).alias("src"),
                          F.col(b_col).alias("dst"))
             .unionByName(pairs.select(F.col(b_col).alias("src"),
                                       F.col(a_col).alias("dst")))
             .distinct())
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    labels = labels.localCheckpoint()
    for _ in range(max_iters):
        prop = (edges.join(labels, edges.src == labels.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("nbr_min")))
        new_labels = (labels.join(prop, "id", "left")
                      .select("id", F.least(
                          F.col("label"),
                          F.coalesce(F.col("nbr_min"), F.col("label")))
                          .alias("label")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    else:
        # labels still moving after max_iters: component diameter
        # exceeds the round budget and the ids below would be WRONG —
        # fail loudly rather than return a silently split cluster
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iters} rounds "
            f"(a similarity chain longer than max_iters); raise "
            f"max_iters or contract with large-star/small-star")
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def canonical_docs(docs: DataFrame, clusters: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Drop every non-canonical near-dup: keep docs that either appear
    in no cluster or ARE their cluster's min-id representative."""
    losers = (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
              .select(F.col("doc_id").alias("__loser")))
    return docs.join(losers, docs[id_col] == F.col("__loser"),
                     "left_anti")
