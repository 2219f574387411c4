"""Composed training-data pipeline: the filter chain a pretraining
corpus build actually runs — length gate, quality gate, near-dup
removal — as one operator over the documents table.

Every stage is one of the individually-gated ops (textstats quality /
token counts, MinHash-LSH pairs, connected-component clustering), so
the composition inherits their scale properties: JVM column expressions
for the gates, banded LSH (never all-pairs) for dedup, min-label
propagation for clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import canonical_docs, minhash_lsh_pairs, near_dup_clusters
from .textstats import quality_score, token_stats


def pretrain_filter(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", min_tokens: int = 5,
                    max_tokens: int = 1000, min_quality: float = 0.3,
                    jaccard: float = 0.8) -> DataFrame:
    """(doc_id) of documents that survive the pretraining filter chain:
    min_tokens <= n_tokens <= max_tokens, quality >= min_quality, and
    not a non-canonical member of a near-dup cluster (Jaccard >=
    `jaccard` via MinHash-LSH; the min-id doc of each cluster stays)."""
    q = quality_score(docs, text_col, id_col).select("doc_id", "quality")
    t = token_stats(docs, text_col, id_col).select("doc_id", "n_tokens")
    keep = (docs.select(F.col(id_col).alias("doc_id"))
            .join(q, "doc_id").join(t, "doc_id")
            .filter((F.col("n_tokens") >= min_tokens)
                    & (F.col("n_tokens") <= max_tokens)
                    & (F.col("quality") >= min_quality)))
    clusters = near_dup_clusters(
        minhash_lsh_pairs(docs, text_col, id_col, threshold=jaccard))
    return canonical_docs(keep, clusters).select("doc_id")
