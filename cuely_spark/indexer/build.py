"""Distributed, resumable inverted-index build.

Spark-first layout (vs the reference's per-WARC-file jobs + tree merge,
/root/reference/crates/core/src/entrypoint/indexer/mod.rs:43-144):

Stage A  (docID assignment / "index sort"):
    input turns -> repartitionByRange(num_segments, conv_id, turn_idx)
    -> sortWithinPartitions -> persist -> per-partition counts give
    cumulative offsets -> mapInPandas assigns dense doc_id = global rank
    of (conv_id, turn_idx) (stable; never monotonically_increasing_id)
    -> written as `turns/segment_id=N` (the row store; reference analog:
    crates/tantivy/src/store/). The persist() pins the sampled range
    boundaries so the count job and the write job can't disagree.

Stage B  (segment build, zero shuffle):
    per job (a group of segments, the resumability/checkpoint unit):
    read `turns` for those segments -> mapInPandas running
    :func:`cuely_spark.indexer.segment.build_segment_rows` -> one write
    partitioned by (kind, segment_id). The kernel groups by the
    segment_id column, so Spark's file packing can never mix segments.
    A manifest JSON per job records lineage (input, segments, row
    counts, posting bytes); `resume=True` skips jobs whose manifest
    entry already exists (reference analog: autocommit + meta.json,
    crates/core/src/inverted_index/indexing.rs:57-75,188-200).

Stage C  (global term stats = the "term dictionary" merge):
    groupBy(term) over per-segment kind='t' rows -> (term, df, ttf),
    written range-partitioned & sorted by term so query-time lookups
    prune to one file + row-group (the Parquet stand-in for tantivy's
    FST, crates/tantivy/src/termdict/). This shuffle moves one row per
    (segment, term) — already pre-aggregated, so no skew; hot-term
    salting lives in the posting-merge operator
    (:mod:`cuely_spark.indexer.merge`) where real posting lists meet.

Global stats (num_docs, total_tokens -> avg_fieldnorm) land in
`stats.json` (reference: bm25.rs:72-79 computes the same at query time).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .segment import INDEX_ROW_SCHEMA, build_segment_rows

DEFAULT_ROWS_PER_SEGMENT = 100_000


@dataclass
class IndexPaths:
    root: str

    @property
    def turns(self) -> str:
        return os.path.join(self.root, "turns")

    @property
    def index(self) -> str:
        return os.path.join(self.root, "index")

    @property
    def postings(self) -> str:
        return os.path.join(self.index, "kind=p")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.root, "term_stats")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.root, "manifest")


def _assign_doc_ids(
    spark: SparkSession,
    df: DataFrame,
    order_cols: tuple[str, ...],
    num_segments: int,
) -> DataFrame:
    """Dense global doc ids by (order_cols) rank; adds doc_id, segment_id."""
    from pyspark import StorageLevel

    part = (
        df.repartitionByRange(num_segments, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        part.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    out_cols = df.columns
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", doc_id long, segment_id int"

    def add_ids(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["doc_id"] = base + seen + __import__("numpy").arange(len(pdf))
            pdf["segment_id"] = pid
            seen += len(pdf)
            yield pdf[out_cols + ["doc_id", "segment_id"]]

    result = part.mapInPandas(add_ids, schema=schema)
    return result, part, acc


def _job_groups(segments: list[int], num_jobs: int) -> list[list[int]]:
    num_jobs = max(1, min(num_jobs, len(segments)))
    size = math.ceil(len(segments) / num_jobs)
    return [segments[i:i + size] for i in range(0, len(segments), size)]


def build_index(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    *,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    doc_id_col: str | None = None,
    rows_per_segment: int = DEFAULT_ROWS_PER_SEGMENT,
    num_segments: int | None = None,
    num_jobs: int = 1,
    store_positions: bool = True,
    resume: bool = False,
) -> IndexPaths:
    """Build a full-text index for `df` at `out_path`.

    If `doc_id_col` is given it must hold unique, stable int64 ids (used
    directly, segments = ranges of that id); otherwise ids are assigned
    as the dense rank of `order_cols`.
    """
    paths = IndexPaths(out_path)
    os.makedirs(paths.manifest_dir, exist_ok=True)
    t0 = time.time()
    phase_sec: dict[str, float] = {}
    _last = [t0]

    def _mark(name: str) -> None:
        now = time.time()
        phase_sec[name] = round(now - _last[0], 2)
        _last[0] = now

    # ---------------- Stage A: doc ids + row store -----------------------
    stage_a_manifest = os.path.join(paths.manifest_dir, "stage_a.json")
    if resume and os.path.exists(stage_a_manifest):
        with open(stage_a_manifest) as f:
            stage_a = json.load(f)
        num_segments = stage_a["num_segments"]
    else:
        if num_segments is None:
            n = df.count()
            _mark("count")
            num_segments = max(1, math.ceil(n / rows_per_segment))
        else:
            n = None  # derived from partition counts below
        if doc_id_col is not None:
            turns = (
                df.withColumn("doc_id", F.col(doc_id_col).cast("long"))
                .repartitionByRange(num_segments, F.col("doc_id"))
                .sortWithinPartitions("doc_id")
                .withColumn("segment_id", F.spark_partition_id())
            )
            part = None
            if n is None:
                n = df.count()
        else:
            turns, part, n_assigned = _assign_doc_ids(
                spark, df, order_cols, num_segments)
            if n is None:
                n = n_assigned
        (turns.write.mode("overwrite").partitionBy("segment_id")
              .parquet(paths.turns))
        if part is not None:
            part.unpersist()
        _mark("stage_a_write_turns")
        stage_a = {
            "num_rows": n,
            "num_segments": num_segments,
            "order_cols": list(order_cols),
            "doc_id_col": doc_id_col,
            "elapsed_sec": time.time() - t0,
        }
        with open(stage_a_manifest, "w") as f:
            json.dump(stage_a, f, indent=1)

    # ---------------- Stage B: per-job segment builds --------------------
    segments = sorted(
        int(d.split("=")[1])
        for d in os.listdir(paths.turns)
        if d.startswith("segment_id=")
    )
    jobs = _job_groups(segments, num_jobs)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def seg_kernel(batches):
        import pandas as pd

        bufs: dict[int, list] = {}
        for pdf in batches:
            for seg, grp in pdf.groupby("segment_id"):
                bufs.setdefault(int(seg), []).append(
                    grp[["doc_id", text_col]]
                )
        for seg, parts in bufs.items():
            allp = pd.concat(parts, ignore_index=True)
            yield build_segment_rows(
                allp["doc_id"].to_numpy(),
                allp[text_col].tolist(),
                segment_id=seg,
                store_positions=store_positions,
            )

    for job_id, segs in enumerate(jobs):
        mpath = os.path.join(paths.manifest_dir, f"job={job_id}.json")
        if resume and os.path.exists(mpath):
            continue
        tj = time.time()
        src = (
            spark.read.option("basePath", paths.turns)
            .parquet(*[
                os.path.join(paths.turns, f"segment_id={s}") for s in segs
            ])
            .select("doc_id", text_col, "segment_id")
        )
        rows = src.mapInPandas(seg_kernel, schema=INDEX_ROW_SCHEMA)
        (rows.write.mode("overwrite").partitionBy("kind", "segment_id")
             .parquet(paths.index))
        _mark(f"job{job_id}_segments")
        # job manifest: lineage + per-segment metrics
        g = (
            spark.read.option("basePath", paths.index)
            .parquet(os.path.join(paths.index, "kind=g"))
            .filter(F.col("segment_id").isin(segs))
            .select("segment_id", "num_docs", "num_terms",
                    "total_tokens", "posting_bytes")
            .collect()
        )
        manifest = {
            "job_id": job_id,
            "segments": segs,
            "input": [os.path.join(paths.turns, f"segment_id={s}")
                      for s in segs],
            "metrics": [r.asDict() for r in g],
            "elapsed_sec": time.time() - tj,
        }
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1)
        _mark(f"job{job_id}_manifest")

    # ---------------- Stage C: global term stats + stats.json ------------
    tseg = spark.read.option("basePath", paths.index).parquet(
        os.path.join(paths.index, "kind=t")
    )
    stats_parts = max(1, min(32, len(segments)))
    (
        tseg.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        .repartitionByRange(stats_parts, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(paths.term_stats)
    )
    _mark("term_stats")
    gseg = spark.read.option("basePath", paths.index).parquet(
        os.path.join(paths.index, "kind=g")
    )
    agg = gseg.agg(
        F.sum("num_docs").alias("num_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        F.sum("posting_bytes").alias("posting_bytes"),
    ).collect()[0]
    _mark("global_stats")
    stats = {
        "num_docs": int(agg["num_docs"]),
        "total_tokens": int(agg["total_tokens"]),
        "avg_fieldnorm": float(agg["total_tokens"]) / float(agg["num_docs"]),
        "posting_bytes": int(agg["posting_bytes"]),
        "num_segments": len(segments),
        "store_positions": store_positions,
        "built_sec": time.time() - t0,
        "phase_sec": phase_sec,
    }
    with open(paths.stats, "w") as f:
        json.dump(stats, f, indent=1)
    return paths
