"""One-pass (Count, TopDocs) tuple collector — search_with_count().

The reference composes count and top-k over a SINGLE scorer walk
(crates/core/src/inverted_index/search.rs:47-95 builds a
`(Count|ApproxCount, TopDocs)` tuple collector;
crates/core/src/collector/approx_count.rs:28-85 defines the
Exact/Approximate composition).  Parity contract here:

- top-k rows identical to search()/search_collect() (both transports),
- count identical to count() for every conjunctive shape,
- union/match-all counts identical to the full-result-set row count,
- ShortCircuit cap poisons exactness (ApproxCount semantics).
"""

import numpy as np
import pytest

from conftest import QUERY_SET


@pytest.fixture(scope="module")
def reader(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    out = str(tmp_path_factory.mktemp("idx_swc"))
    build_index(spark, df, out, rows_per_segment=1200)
    return IndexReader(spark, out)


@pytest.mark.parametrize("q", list(QUERY_SET))
def test_count_and_topk_parity(reader, q):
    try:
        d, s, n = reader.search_with_count(q, k=20, local=False)
    except ValueError:
        pytest.skip("empty query")
    dd, sd = reader.search_collect(q, k=20, local=False)
    assert d.tolist() == dd.tolist()
    np.testing.assert_array_equal(s, sd)
    assert n.exact
    assert int(n) == reader.count(q)


@pytest.mark.parametrize("q", ["test", '"test website"', "website -test",
                               "the test"])
def test_local_path_parity(reader, q):
    dl, sl, nl = reader.search_with_count(q, k=20, local=True)
    dd, sd, nd = reader.search_with_count(q, k=20, local=False)
    assert dl.tolist() == dd.tolist()
    np.testing.assert_array_equal(sl, sd)
    assert nl == nd  # value AND exactness
    assert nl.exact


def test_auto_routing_identical(reader):
    a = reader.search_with_count("example website", k=20)
    b = reader.search_with_count("example website", k=20, local=False)
    assert a[0].tolist() == b[0].tolist()
    assert a[2] == b[2]


def test_union_count(reader):
    d, s, n = reader.search_with_count("test website", k=15,
                                       occur="should", local=False)
    rows = reader.search("test website", k=reader.num_docs,
                         occur="should").collect()
    assert int(n) == len(rows)
    assert n.exact
    assert d.tolist() == [r["doc_id"] for r in rows][:15]
    # local union path
    dl, sl, nl = reader.search_with_count("test website", k=15,
                                          occur="should", local=True)
    assert dl.tolist() == d.tolist()
    assert nl == n


def test_match_all_count(reader):
    d, s, n = reader.search_with_count("* -test", k=10, local=False)
    assert int(n) == reader.count("* -test")
    assert n.exact
    rows = reader.search("* -test", k=10).collect()
    assert d.tolist() == [r["doc_id"] for r in rows]
    # local match-all
    dl, sl, nl = reader.search_with_count("* -test", k=10, local=True)
    assert dl.tolist() == d.tolist()
    assert nl == n


def test_match_all_range_count(reader):
    q = "* turn_idx:>2"
    d, s, n = reader.search_with_count(q, k=10, local=False)
    assert int(n) == reader.count(q)
    assert n.exact


def test_offset(reader):
    d5, s5, n5 = reader.search_with_count("the test", k=10, offset=5,
                                          local=False)
    d0, s0, n0 = reader.search_with_count("the test", k=15,
                                          local=False)
    assert d5.tolist() == d0.tolist()[5:15]
    assert n5 == n0  # pagination never changes the hit count


def test_dead_query(reader):
    d, s, n = reader.search_with_count("xylophonequark zzzznotaterm",
                                       k=10, local=False)
    assert d.size == 0 and s.size == 0
    assert int(n) == 0 and n.exact


def test_shortcircuit_cap_poisons_exactness(reader):
    full = reader.count("the")
    d, s, n = reader.search_with_count("the", k=10,
                                       max_docs_per_segment=5)
    assert d.size == 10
    assert not n.exact          # capped segments report approximate
    assert int(n) > 0
    # single-term estimate is the df itself, so the harvest recovers
    # the true total (ApproxCount, approx_count.rs:104-141)
    assert int(n) == full


def test_count_compose():
    from cuely_spark.queryengine import Count

    assert Count(3).compose(Count(4)) == Count(7, True)
    assert not Count(3, False).compose(Count(4)).exact
    assert repr(Count(2, False)) == "Count.Approximate(2)"
    assert int(Count(9)) == 9


def test_batch_with_count(reader):
    batch = {"a": "test website", "b": '"test website"',
             "c": "website -test",
             "capped": {"q": "the", "max_docs": 5}}
    wc = reader.search_many(batch, k=5, with_count=True).collect()
    plain = reader.search_many(batch, k=5).collect()
    assert ([(x["query"], x["rank"], x["doc_id"]) for x in plain]
            == [(x["query"], x["rank"], x["doc_id"]) for x in wc])
    for q in ("a", "b", "c"):
        rows = [x for x in wc if x["query"] == q]
        assert {x["total"] for x in rows} == {reader.count(batch[q])}
        assert all(x["total_exact"] for x in rows)
    capped = [x for x in wc if x["query"] == "capped"]
    assert capped and not capped[0]["total_exact"]
    # single-term independence estimate degenerates to the df itself,
    # so the harvest recovers the true total despite the cap
    assert capped[0]["total"] == reader.count("the")


def test_batch_with_count_dead_query(reader):
    batch = {"live": "test", "dead": "zzzznotaterm test"}
    wc = reader.search_many(batch, k=5, with_count=True).collect()
    assert {x["query"] for x in wc} == {"live"}
    assert {x["total"] for x in wc} == {reader.count("test")}
