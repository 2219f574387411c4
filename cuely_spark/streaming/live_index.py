"""Structured-Streaming live index: micro-batch -> micro-segments.

Spark mapping of the reference live index
(/root/reference/crates/core/src/live_index/mod.rs:27-32, index.rs:151,
170-246): batches of incoming turns become immediately-searchable
micro-segments; a periodic compaction merges them
(:func:`cuely_spark.indexer.merge.merge_segments` is the hourly-compact
analog); TTL pruning drops segments older than a cutoff.

Semantics:
- doc ids are **arrival-dense**: batch b's docs get the next contiguous
  id range, ordered by (conv_id, turn_idx) within the batch. (The bulk
  builder's global (conv_id, turn_idx) rank needs the whole corpus; a
  stream can't have it. Stability contract: ids never change once
  assigned, and replays of the same batch_id reuse the same range.)
- exactly-once via foreachBatch + idempotent per-batch writes: segment
  dirs are keyed by batch_id and state updates are recorded per
  batch_id, so a replayed batch overwrites itself.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexer.build import IndexPaths
from ..indexer.segment import INDEX_ROW_SCHEMA, build_segment_rows


def refresh_stats(spark: SparkSession, root: str) -> dict:
    """(Re)generate term_stats + stats.json from the index rows —
    shared by the live writer after each batch/compaction."""
    paths = IndexPaths(root)
    tseg = spark.read.option("basePath", paths.index).parquet(
        os.path.join(paths.index, "kind=t"))
    nparts = max(1, min(32, tseg.rdd.getNumPartitions()))
    (tseg.groupBy("term")
     .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
     .repartitionByRange(nparts, "term").sortWithinPartitions("term")
     .write.mode("overwrite").parquet(paths.term_stats))
    g = spark.read.option("basePath", paths.index).parquet(
        os.path.join(paths.index, "kind=g"))
    agg = g.agg(F.sum("num_docs").alias("nd"),
                F.sum("total_tokens").alias("tt"),
                F.sum("posting_bytes").alias("pb"),
                F.count("*").alias("nseg")).collect()[0]
    stats = {
        "num_docs": int(agg["nd"]),
        "total_tokens": int(agg["tt"]),
        "avg_fieldnorm": float(agg["tt"]) / float(agg["nd"]),
        "posting_bytes": int(agg["pb"]),
        "num_segments": int(agg["nseg"]),
        "store_positions": True,
        "live": True,
    }
    with open(paths.stats, "w") as f:
        json.dump(stats, f, indent=1)
    return stats


class LiveIndexWriter:
    def __init__(self, spark: SparkSession, root: str,
                 text_col: str = "text",
                 order_cols: tuple[str, ...] = ("conv_id", "turn_idx")):
        self.spark = spark
        self.paths = IndexPaths(root)
        self.text_col = text_col
        self.order_cols = list(order_cols)
        os.makedirs(self.paths.manifest_dir, exist_ok=True)
        self._state_path = os.path.join(self.paths.manifest_dir,
                                        "live_state.json")
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                self.state = json.load(f)
        else:
            self.state = {"next_doc_id": 0, "batches": {}}

    # -- foreachBatch sink -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        bkey = str(batch_id)
        prev = self.state["batches"].get(bkey)
        if prev is not None:
            base = prev["base"]          # replay: reuse the id range
        else:
            base = self.state["next_doc_id"]
        pdf = (batch_df.orderBy(*self.order_cols)
               .select(*self.order_cols, self.text_col).toPandas())
        n = len(pdf)
        if n == 0:
            return
        import numpy as np

        seg_id = 100_000 + batch_id  # live segments namespaced high
        rows = build_segment_rows(
            base + np.arange(n, dtype=np.int64),
            pdf[self.text_col].tolist(), segment_id=seg_id)
        out = self.spark.createDataFrame(rows, schema=INDEX_ROW_SCHEMA)
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
        (out.write.mode("overwrite").partitionBy("kind", "segment_id")
         .parquet(self.paths.index))
        # row store for retrieval
        pdf = pdf.copy()
        pdf["doc_id"] = base + np.arange(n, dtype=np.int64)
        pdf["segment_id"] = seg_id
        (self.spark.createDataFrame(pdf)
         .write.mode("overwrite").partitionBy("segment_id")
         .parquet(self.paths.turns))
        self.state["batches"][bkey] = {"base": base, "n": n,
                                       "segment_id": seg_id}
        self.state["next_doc_id"] = max(self.state["next_doc_id"],
                                        base + n)
        with open(self._state_path, "w") as f:
            json.dump(self.state, f, indent=1)
        refresh_stats(self.spark, self.paths.root)

    def sink(self):
        """Use as .writeStream.foreachBatch(writer.sink())."""
        return lambda df, bid: self.process_batch(df, bid)

    # -- maintenance (reference: prune every 6h / compact hourly) ----------
    def prune_older_than(self, min_batch_id: int) -> int:
        """TTL pruning: drop live segments from batches < min_batch_id
        (reference: 60-day TTL, live_index/mod.rs:27-32)."""
        dropped = 0
        for bkey in list(self.state["batches"]):
            if int(bkey) < min_batch_id:
                seg = self.state["batches"][bkey]["segment_id"]
                for kind in "ptdg":
                    shutil.rmtree(
                        os.path.join(self.paths.index, f"kind={kind}",
                                     f"segment_id={seg}"),
                        ignore_errors=True)
                shutil.rmtree(
                    os.path.join(self.paths.turns, f"segment_id={seg}"),
                    ignore_errors=True)
                del self.state["batches"][bkey]
                dropped += 1
        with open(self._state_path, "w") as f:
            json.dump(self.state, f, indent=1)
        if dropped:
            refresh_stats(self.spark, self.paths.root)
        return dropped

    def compact(self, out_root: str, target_segments: int = 1,
                hot_df_threshold: int = 500_000) -> IndexPaths:
        """Merge all live micro-segments into a compact index
        (reference: hourly compaction, live_index/index.rs:170-246)."""
        from ..indexer.merge import merge_segments

        return merge_segments(self.spark, self.paths.root, out_root,
                              target_segments=target_segments,
                              hot_df_threshold=hot_df_threshold)
