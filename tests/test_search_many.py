"""Batch query execution (queries-as-data): one Spark job, every query
rank-identical to the oracle."""

import numpy as np
import pytest

from conftest import QUERY_SET


@pytest.fixture(scope="module")
def reader(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    out = str(tmp_path_factory.mktemp("idx_many"))
    build_index(spark, df, out, rows_per_segment=1500)
    return IndexReader(spark, out)


def test_search_many_rank_identity(reader, oracle_small):
    queries = {f"q{i}": q for i, q in enumerate(QUERY_SET)}
    queries["absent"] = "zzzabsent term"
    rows = reader.search_many(queries, k=10).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query"], []).append((r["rank"], r["doc_id"],
                                                r["score"]))
    for name, q in queries.items():
        od, os_ = oracle_small.search(q, k=10)
        got = sorted(by_q.get(name, []))
        assert [g[1] for g in got] == od.tolist(), f"{name}: {q!r}"
        np.testing.assert_allclose(
            np.array([g[2] for g in got]), os_.astype(np.float64),
            rtol=1e-6)
    assert "absent" not in by_q


def test_batch_max_docs_matches_search(reader):
    """Per-query ShortCircuit cap in batch mode == search()'s
    max_docs_per_segment."""
    q = "the"
    rows = reader.search(q, k=25, max_docs_per_segment=7).collect()
    res = reader.search_many(
        {"capped": {"q": q, "max_docs": 7}, "plain": q},
        k=25).collect()
    got = sorted((r["rank"], r["doc_id"]) for r in res
                 if r["query"] == "capped")
    want = [(i + 1, r["doc_id"]) for i, r in enumerate(rows)]
    assert got == want
    plain = [r for r in res if r["query"] == "plain"]
    uncapped = reader.search(q, k=25).collect()
    assert sorted((r["rank"], r["doc_id"]) for r in plain) == \
        [(i + 1, r["doc_id"]) for i, r in enumerate(uncapped)]
