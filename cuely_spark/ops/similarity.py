"""Similarity search over an embedding column (array<float>).

- knn_bruteforce: exact cosine top-k of a query vector. JVM-side
  zip_with/aggregate dot product — one narrow scan, no shuffle except
  the final tiny top-k; the correctness baseline.
- knn_bruteforce_pandas: same math as a vectorized Arrow/pandas UDF
  (numpy matmul) — faster per-row at wide dims, used by bench.
- lsh_knn: random-hyperplane LSH — deterministic md5-seeded hyperplanes,
  bucket join on the sign signature, exact re-rank inside probed
  buckets. The scale path: candidate set ~ N / 2^bits per probe.
- ivf_knn: IVF over kmeans-lite centroids (one pandas pass), probe
  nprobe nearest centroids, exact re-rank inside.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v))


def cosine_scores(emb: DataFrame, query_vec, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """(vec_id, cosine) for every vector — JVM-side fold, no shuffle."""
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    cos = _dot(F.col(vec_col).cast("array<double>"), q) / (
        _norm(F.col(vec_col).cast("array<double>"))
        * float(np.sqrt(np.dot(query_vec, query_vec))))
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.round(cos, 6).alias("cosine"))


def knn_bruteforce(emb: DataFrame, query_vec, k: int = 10,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine) ordered desc, id tiebreak."""
    return (cosine_scores(emb, query_vec, vec_col, id_col)
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


def knn_bruteforce_pandas(emb: DataFrame, query_vec, k: int = 10,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Same result via Arrow-batched numpy matmul (the fast path)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qv)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = (m @ qv) / (np.linalg.norm(m, axis=1) * qn)
            yield pd.DataFrame({"vec_id": pdf[id_col], "cosine": cos})

    # round JVM-side (half-up, matches DuckDB round) — numpy's banker's
    # rounding differs at .5 boundaries
    scored = emb.select(id_col, vec_col).mapInPandas(
        score, schema="vec_id long, cosine double")
    return (scored.select("vec_id", F.round("cosine", 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k))


def _hyperplanes(dim: int, nbits: int, seed: str = "lsh") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5(seed|i|j)."""
    import hashlib

    h = np.empty((nbits, dim), dtype=np.float64)
    for i in range(nbits):
        for j in range(dim):
            v = int(hashlib.md5(f"{seed}|{i}|{j}".encode()).hexdigest()[:8],
                    16)
            h[i, j] = (v / 0xFFFFFFFF) * 2.0 - 1.0
    return h


def lsh_signatures(emb: DataFrame, nbits: int = 8,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id", seed: str = "lsh") -> DataFrame:
    """(vec_id, bucket): random-hyperplane sign signature as int."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    planes = _hyperplanes(int(first["d"]), nbits, seed)

    def sig(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (m @ planes.T) > 0
            buckets = (bits * (1 << np.arange(nbits))).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col],
                                "bucket": buckets.astype(np.int64)})

    return emb.select(id_col, vec_col).mapInPandas(
        sig, schema="vec_id long, bucket long")


def lsh_knn(emb: DataFrame, query_vec, k: int = 10, nbits: int = 8,
            vec_col: str = "embedding", id_col: str = "vec_id",
            seed: str = "lsh", max_hamming: int = 1) -> DataFrame:
    """ANN: probe the query's bucket plus all buckets within hamming
    distance `max_hamming` (the nprobe-style recall/cost knob — probe
    count = sum of C(nbits, i) for i <= max_hamming), exact cosine
    re-rank inside."""
    from itertools import combinations

    first = emb.select(F.size(vec_col).alias("d")).first()
    planes = _hyperplanes(int(first["d"]), nbits, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ qv) > 0
    qbucket = int((qbits * (1 << np.arange(nbits))).sum())
    probes = [qbucket]
    for h in range(1, max_hamming + 1):
        for bits in combinations(range(nbits), h):
            mask = 0
            for b in bits:
                mask |= 1 << b
            probes.append(qbucket ^ mask)
    sigs = lsh_signatures(emb, nbits, vec_col, id_col, seed)
    cand_ids = (sigs.filter(F.col("bucket").isin(probes))
                .select(F.col("vec_id").alias("__cand_id")))
    cand = emb.join(cand_ids, F.col(id_col) == F.col("__cand_id"),
                    "left_semi")
    return knn_bruteforce_pandas(cand, query_vec, k, vec_col, id_col)


def _round_half_away(x: np.ndarray, d: int = 6) -> np.ndarray:
    """round-half-away-from-zero — matches SQL round(), not np.round."""
    s = 10.0 ** d
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


IVF_SAMPLE_CAP = 2048


def _ivf_sample(emb: DataFrame, vec_col: str, id_col: str) -> np.ndarray:
    """Deterministic pseudo-random training sample: order by
    md5(CAST(id AS STRING)) (id tie-break), take IVF_SAMPLE_CAP.

    Why not the lowest ids: at 100 TB the lowest ids are one shard /
    time-slice, so id-ordered sampling trains centroids on a biased
    corner of the corpus and probe recall silently degrades. The md5
    order is uniform over the corpus yet exactly reproducible in the
    DuckDB oracle (same ORDER BY md5 expression) and across cluster
    layouts — an unordered limit() would be partition-layout-dependent.
    The sample is tiny (<= 2048 rows) so the driver collect is safe."""
    return np.stack(
        [r[vec_col] for r in
         emb.select(id_col, vec_col)
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
         .limit(IVF_SAMPLE_CAP).collect()]).astype(np.float64)


def train_ivf_centroids(sample: np.ndarray, ncells: int,
                        iters: int = 5) -> np.ndarray:
    """Deterministic kmeans-lite whose every step is reproducible in
    plain SQL (the DuckDB oracle unrolls the same iterations):

    - init = sample rows at ranks (i*n)//ncells (sample is id-sorted)
    - assignment = cosine argmax, ties to the lowest cell
    - update = per-cell mean rounded half-away to 6 decimals (so engine
      summation-order noise (~1e-15) can never diverge the training);
      empty cells keep their previous centroid
    """
    n_s = len(sample)
    nc = min(ncells, n_s)
    cents = sample[(np.arange(nc) * n_s) // nc].copy()
    snorm = np.linalg.norm(sample, axis=1)
    for _ in range(iters):
        sim = (sample @ cents.T) / (snorm[:, None]
                                    * np.linalg.norm(cents, axis=1))
        assign = sim.argmax(axis=1)  # first max == lowest-cell tiebreak
        new = cents.copy()
        for c in range(nc):
            m = sample[assign == c]
            if len(m):
                new[c] = _round_half_away(m.mean(axis=0), 6)
        cents = new
    return cents


def ivf_knn(emb: DataFrame, query_vec, k: int = 10, ncells: int = 16,
            nprobe: int = 3, vec_col: str = "embedding",
            id_col: str = "vec_id", iters: int = 5) -> DataFrame:
    """IVF ANN: kmeans-lite centroids (sampled, driver-side numpy),
    cells assigned via mapInPandas, query probes `nprobe` cells."""
    sample = _ivf_sample(emb, vec_col, id_col)
    cents = train_ivf_centroids(sample, ncells, iters)

    def assign_cells(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sim = (m @ cents.T) / (
                np.linalg.norm(m, axis=1, keepdims=True)
                * np.linalg.norm(cents, axis=1))
            yield pd.DataFrame({"vec_id": pdf[id_col],
                                "cell": sim.argmax(axis=1).astype(np.int64)})

    cells = emb.select(id_col, vec_col).mapInPandas(
        assign_cells, schema="vec_id long, cell long")
    qv = np.asarray(query_vec, dtype=np.float64)
    qsim = (cents @ qv) / (np.linalg.norm(cents, axis=1)
                           * np.linalg.norm(qv))
    probes = [int(c) for c in np.argsort(-qsim, kind="stable")[:nprobe]]
    cand_ids = (cells.filter(F.col("cell").isin(probes))
                .select(F.col("vec_id").alias("__cand_id")))
    cand = emb.join(cand_ids, F.col(id_col) == F.col("__cand_id"),
                    "left_semi")
    return knn_bruteforce_pandas(cand, query_vec, k, vec_col, id_col)
