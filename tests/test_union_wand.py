"""Multi-scorer block-max WAND (scored disjunction) — pruned top-k must
equal exhaustive union top-k (reference oracle pattern:
crates/tantivy/src/query/boolean_query/block_wand.rs:301-623)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cuely_spark.bm25 import Bm25Weight
from cuely_spark.queryengine.kernel import union_topk

from test_kernel_oracle import _make_tp


@st.composite
def multi_postings(draw):
    n_docs = draw(st.integers(min_value=1, max_value=1500))
    n_terms = draw(st.integers(min_value=1, max_value=5))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    terms = []
    for _ in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)
                       ).astype(np.int64)
        tfs = rng.integers(1, 30, size=df).astype(np.int64)
        fnids = rng.integers(0, 256, size=df).astype(np.int64)
        terms.append((docs, tfs, fnids))
    return terms, n_docs


def _brute_force(terms, weights, k, dtype=np.float32):
    d = dtype
    scores: dict[int, np.float32] = {}
    for (docs, tfs, fnids), w in zip(terms, weights):
        per = w.score(fnids, tfs)
        for doc, s in zip(docs.tolist(), per):
            scores[doc] = d(scores.get(doc, d(0.0)) + s)
    items = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return ([i for i, _ in items],
            np.array([s for _, s in items], dtype=d))


@given(multi_postings(), st.integers(min_value=1, max_value=30))
@settings(max_examples=120, deadline=None)
def test_union_wand_equals_bruteforce(postings, k):
    terms, n_docs = postings
    weights = [Bm25Weight(t[0].size, n_docs, 13.7) for t in terms]
    specs = [(_make_tp(*t), w) for t, w in zip(terms, weights)]
    got_d, got_s = union_topk(specs, k)
    exp_d, exp_s = _brute_force(terms, weights, k)
    assert got_d.tolist() == exp_d
    np.testing.assert_array_equal(got_s, exp_s)


def test_union_wand_with_mustnot():
    rng = np.random.default_rng(7)
    n_docs = 800
    terms = []
    for df in (300, 500):
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)
                       ).astype(np.int64)
        terms.append((docs, rng.integers(1, 9, size=df).astype(np.int64),
                      rng.integers(0, 200, size=df).astype(np.int64)))
    nd = np.sort(rng.choice(n_docs, size=400, replace=False)).astype(np.int64)
    neg = _make_tp(nd, np.ones(400, dtype=np.int64),
                   np.zeros(400, dtype=np.int64))
    weights = [Bm25Weight(t[0].size, n_docs, 11.0) for t in terms]
    specs = [(_make_tp(*t), w) for t, w in zip(terms, weights)]
    got_d, got_s = union_topk(specs, 25, mustnot_groups=[[neg]])
    # brute force with exclusion
    exp_d, exp_s = _brute_force(terms, weights, 10**9)
    excl = set(nd.tolist())
    pairs = [(d, s) for d, s in zip(exp_d, exp_s) if d not in excl][:25]
    assert got_d.tolist() == [d for d, _ in pairs]
    np.testing.assert_array_equal(got_s, np.array([s for _, s in pairs],
                                                  dtype=np.float32))


@pytest.mark.parametrize("q", ["example website", "the test website",
                               "xylophonequark test", "zzz website"])
def test_oracle_should_vs_kernel_on_corpus(transcripts_small,
                                           oracle_small, q):
    """Corpus-level should-mode: kernel (via per-segment postings built
    by the segment builder) matches the oracle's disjunctive search."""
    from cuely_spark.indexer.segment import build_segment_rows
    from cuely_spark.queryengine.parser import parse_query
    from test_kernel_oracle import _tp_from_rows

    rows = build_segment_rows(
        transcripts_small["expected_doc_id"].to_numpy(),
        transcripts_small["text"].tolist(), segment_id=0)
    p = rows[rows["kind"] == "p"]
    pq = parse_query(q)
    specs = []
    for c in pq.positive:
        t = c.tokens[0]
        w = Bm25Weight(oracle_small.df(t), oracle_small.num_docs,
                       oracle_small.avg_fieldnorm)
        specs.append((_tp_from_rows(p, t), w))
    got_d, got_s = union_topk(specs, 20)
    exp_d, exp_s = oracle_small.search_should(q, k=20)
    assert got_d.tolist() == exp_d.tolist()
    np.testing.assert_allclose(got_s, exp_s, rtol=1e-6)


def test_blocks_overlapping_unsorted_input():
    """blocks_overlapping must be order-independent: an out-of-range
    candidate preceding in-range ones must not shift the alignment
    (regression: prefix-slice misalignment dropped needed blocks)."""
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(100_000, size=2000, replace=False)
                   ).astype(np.int64)
    tp = _make_tp(docs, np.ones(2000, dtype=np.int64),
                  np.zeros(2000, dtype=np.int64))
    cand_sorted = np.sort(rng.choice(110_000, size=300, replace=False)
                          ).astype(np.int64)
    expect = tp.blocks_overlapping(cand_sorted)
    for seed in range(5):
        perm = np.random.default_rng(seed).permutation(cand_sorted.size)
        got = tp.blocks_overlapping(cand_sorted[perm])
        np.testing.assert_array_equal(got, expect)
    # adversarial: one beyond-last-doc candidate first, real ones after
    adv = np.concatenate([[docs[-1] + 50_000], docs[:10]]).astype(np.int64)
    np.testing.assert_array_equal(
        tp.blocks_overlapping(adv), tp.blocks_overlapping(np.sort(adv)))


def test_union_wand_large_docspace_clustered():
    """Large doc space + clustered per-term ranges: intervals arrive at
    blocks_overlapping in bound-descending (unsorted) order and some
    exceed a term's last block (regression: 21/300 trials returned wrong
    top-k before the order-independence fix)."""
    for seed in range(60):
        rng = np.random.default_rng(seed)
        n_docs = 2_000_000
        terms = []
        n_terms = int(rng.integers(2, 5))
        for _ in range(n_terms):
            nclust = int(rng.integers(1, 5))
            parts = []
            for _ in range(nclust):
                base = int(rng.integers(0, n_docs - 4000))
                width = int(rng.integers(500, 4000))
                size = int(rng.integers(100, min(width, 1500)))
                parts.append(base + rng.choice(width, size=size,
                                               replace=False))
            docs = np.unique(np.concatenate(parts)).astype(np.int64)
            tfs = rng.integers(1, 30, size=docs.size).astype(np.int64)
            fnids = rng.integers(0, 256, size=docs.size).astype(np.int64)
            terms.append((docs, tfs, fnids))
        k = int(rng.integers(1, 40))
        weights = [Bm25Weight(t[0].size, n_docs, 13.7) for t in terms]
        specs = [(_make_tp(*t), w) for t, w in zip(terms, weights)]
        got_d, got_s = union_topk(specs, k)
        exp_d, exp_s = _brute_force(terms, weights, k)
        assert got_d.tolist() == exp_d, f"seed {seed}"
        np.testing.assert_array_equal(got_s, exp_s)
