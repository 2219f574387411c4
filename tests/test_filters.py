"""Attribute-filter queries (role:/tool: — the site:/intitle: analog):
unscored Must clauses; rank-identical to the oracle with identical
attr-term indexing."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.oracle import OracleIndex
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    out = str(tmp_path_factory.mktemp("idx_attr"))
    build_index(spark, df, out, rows_per_segment=1500,
                attr_cols=("role", "tool"))
    attrs = [
        [f"role:{r}"] + ([f"tool:{t}"] if t else [])
        for r, t in zip(transcripts_small["role"],
                        transcripts_small["tool"])
    ]
    oracle = OracleIndex(
        transcripts_small["expected_doc_id"].to_numpy(),
        transcripts_small["text"].tolist(),
        attr_tokens=attrs)
    return IndexReader(spark, out), oracle


@pytest.mark.parametrize("q", [
    "test role:user",
    "example website role:assistant",
    "the tool:bash",
    '"test website" role:system',
    "website role:user -tool:search",
    "role:tool",                      # filter-only query (zero scores)
])
def test_filter_rank_identity(setup, q):
    reader, oracle = setup
    docs, scores = reader.search_collect(q, k=20)
    od, os_ = oracle.search(q, k=20)
    assert docs.tolist() == od.tolist(), q
    np.testing.assert_allclose(scores, os_.astype(np.float64), rtol=1e-6)
    assert reader.count(q) == oracle.count(q)


def test_filter_restricts_results(setup, transcripts_small):
    reader, _ = setup
    docs, _ = reader.search_collect("test role:user", k=20)
    exp = transcripts_small.reset_index(drop=True)
    for d in docs:
        assert exp.iloc[d]["role"] == "user"


def test_filters_do_not_affect_scores(setup):
    """A doc's BM25 score must be identical with and without a filter
    clause attached (filters are unscored)."""
    reader, _ = setup
    d1, s1 = reader.search_collect("example website", k=200)
    d2, s2 = reader.search_collect("example website role:user", k=200)
    m1 = dict(zip(d1.tolist(), s1.tolist()))
    for d, s in zip(d2.tolist(), s2.tolist()):
        assert d in m1 and abs(m1[d] - s) < 1e-9


def test_absent_filter_value(setup):
    reader, _ = setup
    docs, _ = reader.search_collect("test role:nonexistent", k=10)
    assert docs.size == 0
