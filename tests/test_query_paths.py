"""Both query execution paths (single-task coordinator vs per-segment
fanout) must return identical, oracle-identical results."""

import numpy as np
import pytest

from conftest import QUERY_SET


@pytest.fixture(scope="module")
def reader(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    out = str(tmp_path_factory.mktemp("idx_paths"))
    build_index(spark, df, out, rows_per_segment=1200)
    return IndexReader(spark, out)


@pytest.mark.parametrize("q", ["test", "example website", '"test website"',
                               "the", "website -test"])
def test_fanout_path_matches_single_task(reader, oracle_small, q):
    reader.small_query_blocks = 10**9  # force single-task
    d1, s1 = reader.search_collect(q, k=20)
    reader.small_query_blocks = 0      # force per-segment fanout
    try:
        d2, s2 = reader.search_collect(q, k=20)
    finally:
        reader.small_query_blocks = 4096
    assert d1.tolist() == d2.tolist()
    np.testing.assert_array_equal(s1, s2)
    od, _ = oracle_small.search(q, k=20)
    assert d1.tolist() == od.tolist()
