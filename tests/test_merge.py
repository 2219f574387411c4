"""Segment-merge tests: merged index answers every query identically to
the source index (both cold re-block and hot salted paths exercised)."""

import json
import os

import numpy as np
import pytest

from conftest import QUERY_SET


@pytest.fixture(scope="module")
def merged(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index, merge_segments

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    src = str(tmp_path_factory.mktemp("merge_src"))
    build_index(spark, df, src, rows_per_segment=800, num_jobs=2)
    dst = str(tmp_path_factory.mktemp("merge_dst"))
    # hot_df_threshold=200 forces real terms ('the' df≈3600) down the
    # salted hot path while most terms re-block on the cold path
    merge_segments(spark, src, dst, target_segments=2,
                   hot_df_threshold=200)
    return src, dst


def test_merged_stats(merged, oracle_small):
    src, dst = merged
    with open(os.path.join(dst, "stats.json")) as f:
        stats = json.load(f)
    assert stats["num_segments"] == 2
    assert stats["num_docs"] == oracle_small.num_docs
    assert stats["segment_map"]


@pytest.mark.parametrize("q", QUERY_SET)
def test_merged_rank_identity(spark, merged, oracle_small, q):
    from cuely_spark.queryengine import IndexReader

    _, dst = merged
    r = IndexReader(spark, dst)
    docs, scores = r.search_collect(q, k=20)
    odocs, oscores = oracle_small.search(q, k=20)
    assert docs.tolist() == odocs.tolist(), f"merged rank mismatch: {q!r}"
    np.testing.assert_allclose(scores, oscores.astype(np.float64),
                               rtol=1e-6)
    assert r.count(q) == oracle_small.count(q)


def test_merged_with_meta_uses_source_turns(spark, merged,
                                            transcripts_small):
    from cuely_spark.queryengine import IndexReader

    _, dst = merged
    r = IndexReader(spark, dst)
    rows = r.search("example website", k=3, with_meta=True).collect()
    assert len(rows) == 3
    exp = transcripts_small.reset_index(drop=True)
    for row in rows:
        assert row["conv_id"] == exp.iloc[row["doc_id"]]["conv_id"]


def test_cold_blocks_fully_packed(spark, merged):
    """Cold path must emit only full 128-doc blocks (except the last
    block of each term)."""
    from pyspark.sql import functions as F

    _, dst = merged
    p = (spark.read.option("basePath", os.path.join(dst, "index"))
         .parquet(os.path.join(dst, "index", "kind=p")))
    w_max = (p.groupBy("segment_id", "term")
             .agg(F.max("block_id").alias("maxb")))
    joined = p.join(w_max, ["segment_id", "term"])
    bad = joined.filter((F.col("block_id") < F.col("maxb"))
                        & (F.col("ndocs") < 128))
    # hot (salted) terms may keep boundary partials; cold terms may not.
    # hot = per-merge-group df > 200, read from the merged kind=t rows.
    tseg = (spark.read.option("basePath", os.path.join(dst, "index"))
            .parquet(os.path.join(dst, "index", "kind=t"))
            .select("segment_id", "term",
                    F.col("df").alias("seg_df")))
    bad_cold = (bad.join(tseg, ["segment_id", "term"])
                .filter(F.col("seg_df") <= 200))
    assert bad_cold.count() == 0
    # and the salted path must actually have been exercised
    assert (tseg.filter(F.col("seg_df") > 200).count()) > 0


def test_merge_preserves_shadow_fields(spark, tmp_path):
    """Merging an ngram+stem index keeps compound/stemmed matching (and
    the stats flags that auto-enable it)."""
    import numpy as np

    from cuely_spark.indexer import build_index
    from cuely_spark.indexer.merge import merge_segments
    from cuely_spark.queryengine import IndexReader

    rows = [(i, t) for i, t in enumerate(
        ["i love new york", "newyork", "running fast", "nothing here",
         "new things", "york minster"] * 3)]
    df = spark.createDataFrame(
        [(i, t) for i, (j, t) in enumerate(rows)],
        "doc_id long, text string")
    src = str(tmp_path / "src")
    build_index(spark, df, src, doc_id_col="doc_id", rows_per_segment=6,
                ngram_max=3, stem=True)
    dst = str(tmp_path / "merged")
    merge_segments(spark, src, dst, target_segments=1, hot_df_threshold=2)
    r0, r1 = IndexReader(spark, src), IndexReader(spark, dst)
    assert r1.stats["ngram_max"] == 3 and r1.stats["stemmed"] is True
    for q in ["new york", "runs"]:
        d0, s0 = r0.search_collect(q, k=20, dtype=np.float64)
        d1, s1 = r1.search_collect(q, k=20, dtype=np.float64)
        assert d0.tolist() == d1.tolist(), q
        np.testing.assert_array_equal(s0, s1)
