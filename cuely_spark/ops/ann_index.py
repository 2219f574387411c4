"""Persisted ANN indexes over an embedding column.

The on-the-fly paths (ops/similarity.lsh_knn / ivf_knn) recompute
signatures per query; these builders persist them ONCE with a layout
chosen for query-time partition pruning:

- rows are written **partitioned by bucket/cell**, carrying the vector
  inline, so a probe reads only the probed partitions in a single scan —
  no join back to the corpus, no signature recompute. At 100 TB a
  hamming<=1 LSH probe touches (nbits+1)/2^nbits of the files and an
  IVF probe nprobe/ncells; everything else is pruned by the Hive-style
  partition directory, never opened.
- the tiny model (hyperplane seed / centroids) lives in meta.json via
  fsio, so index roots can be object stores.

Query results are IDENTICAL to the on-the-fly operators with the same
parameters (same md5-seeded hyperplanes, same deterministic kmeans) —
the same DuckDB oracles therefore gate both paths.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsio
from .similarity import (
    IVF_SAMPLE_CAP,
    _hyperplanes,
    knn_bruteforce_pandas,
    train_ivf_centroids,
)


def _meta_path(index_path: str) -> str:
    return os.path.join(index_path, "meta.json")


def build_lsh_index(emb: DataFrame, out_path: str, nbits: int = 8,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: str = "lsh") -> str:
    """Persist (vec_id, embedding) partitioned by the random-hyperplane
    sign bucket."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    planes = _hyperplanes(dim, nbits, seed)

    def sig(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (m @ planes.T) > 0
            buckets = (bits * (1 << np.arange(nbits))).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col],
                                "embedding": pdf[vec_col],
                                "bucket": buckets.astype(np.int64)})

    vec_type = emb.schema[vec_col].dataType.simpleString()
    rows = emb.select(id_col, vec_col).mapInPandas(
        sig, schema=f"vec_id long, embedding {vec_type}, bucket long")
    (rows.write.mode("overwrite").partitionBy("bucket")
         .parquet(os.path.join(out_path, "vectors")))
    fsio.write_json(_meta_path(out_path), {
        "kind": "lsh", "nbits": nbits, "dim": dim, "seed": seed})
    return out_path


def lsh_index_search(spark: SparkSession, index_path: str, query_vec,
                     k: int = 10) -> DataFrame:
    """ANN top-k from a persisted LSH index: hamming<=1 bucket probes
    become partition pruning; exact cosine rerank on the probed rows."""
    meta = fsio.read_json(_meta_path(index_path))
    planes = _hyperplanes(meta["dim"], meta["nbits"], meta["seed"])
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ qv) > 0
    qbucket = int((qbits * (1 << np.arange(meta["nbits"]))).sum())
    probes = [qbucket] + [qbucket ^ (1 << b)
                          for b in range(meta["nbits"])]
    cand = (spark.read.parquet(os.path.join(index_path, "vectors"))
            .filter(F.col("bucket").isin(probes)))
    return knn_bruteforce_pandas(cand, query_vec, k)


def build_ivf_index(emb: DataFrame, out_path: str, ncells: int = 16,
                    iters: int = 5, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> str:
    """Persist (vec_id, embedding) partitioned by IVF cell; centroids
    (trained with the deterministic kmeans-lite) go to meta.json."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    from .similarity import _ivf_sample

    sample = _ivf_sample(emb, vec_col, id_col)
    cents = train_ivf_centroids(sample, ncells, iters)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sim = (m @ cents.T) / (
                np.linalg.norm(m, axis=1, keepdims=True)
                * np.linalg.norm(cents, axis=1))
            yield pd.DataFrame({"vec_id": pdf[id_col],
                                "embedding": pdf[vec_col],
                                "cell": sim.argmax(axis=1).astype(
                                    np.int64)})

    vec_type = emb.schema[vec_col].dataType.simpleString()
    rows = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"vec_id long, embedding {vec_type}, cell long")
    (rows.write.mode("overwrite").partitionBy("cell")
         .parquet(os.path.join(out_path, "vectors")))
    fsio.write_json(_meta_path(out_path), {
        "kind": "ivf", "ncells": int(len(cents)), "dim": dim,
        "iters": iters, "centroids": [[float(x) for x in c]
                                      for c in cents]})
    return out_path


def ivf_index_search(spark: SparkSession, index_path: str, query_vec,
                     k: int = 10, nprobe: int = 3) -> DataFrame:
    """ANN top-k from a persisted IVF index: nprobe nearest-centroid
    cells read via partition pruning; exact cosine rerank."""
    meta = fsio.read_json(_meta_path(index_path))
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    qsim = (cents @ qv) / (np.linalg.norm(cents, axis=1)
                           * np.linalg.norm(qv))
    probes = [int(c) for c in np.argsort(-qsim, kind="stable")[:nprobe]]
    cand = (spark.read.parquet(os.path.join(index_path, "vectors"))
            .filter(F.col("cell").isin(probes)))
    return knn_bruteforce_pandas(cand, query_vec, k)
