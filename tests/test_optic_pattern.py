"""Optic token-pattern matchers: parse + kernel pattern_mask fuzz vs a
brute-force model of the reference scorer semantics
(crates/core/src/query/pattern_query/scorer.rs NormalPatternScorer:
in-order chain with per-gap slop, start/end anchors), plus the
end-to-end segment_topk boost/discard integration."""

import numpy as np
import pytest

from cuely_spark.bm25 import Bm25Weight
from cuely_spark.indexer.segment import build_segment_rows
from cuely_spark.queryengine.kernel import (matcher_mask, pattern_mask,
                                            segment_topk)
from cuely_spark.queryengine.optic import (WILDCARD_SLOP, PatternMatcher,
                                           parse_pattern)
from cuely_spark.tokenizer import tokenize

from tests.test_kernel_fuzz import VOCAB, _corpus, _tp_from_rows, wfn


def _brute_pattern(tt, pm: PatternMatcher) -> bool:
    """Reference semantics over a raw token list (scorer.rs:257-338)."""
    pos = {t: [i for i, x in enumerate(tt) if x == t] for t in pm.terms}
    if any(not pos[t] for t in pm.terms):
        return False
    if pm.anchor_start and pos[pm.terms[0]][0] != 0:
        return False
    if pm.anchor_end and pos[pm.terms[-1]][-1] != len(tt) - 1:
        return False
    live = pos[pm.terms[0]]
    for i, t in enumerate(pm.terms[1:]):
        s = pm.slops[i]
        live = [r for r in pos[t]
                if any(r - s <= l <= r for l in live)]
        if not live:
            return False
    return True


def test_parse_pattern_forms():
    pm = parse_pattern("error * timeout")
    assert pm.terms == ("error", "timeout")
    assert pm.slops == (WILDCARD_SLOP,)
    pm = parse_pattern("|warning")
    assert pm.anchor_start and not pm.anchor_end
    pm = parse_pattern("key order |")
    assert pm.slops == (1,) and pm.anchor_end
    # glued anchors/wildcards split like the reference lexer
    pm = parse_pattern("|a*b|")
    assert pm.terms == ("a", "b")
    assert pm.slops == (WILDCARD_SLOP,)
    assert pm.anchor_start and pm.anchor_end
    with pytest.raises(ValueError):
        parse_pattern("| * |")


@pytest.mark.parametrize("base_seed", [7000])
def test_pattern_mask_fuzz(base_seed):
    for trial in range(50):
        rng = np.random.default_rng(base_seed + trial)
        n_docs = int(rng.integers(5, 200))
        texts = _corpus(rng, n_docs)
        rows = build_segment_rows(
            np.arange(n_docs, dtype=np.int64), texts, segment_id=0)
        p = rows[rows["kind"] == "p"]
        toks = [tokenize(t) for t in texts]
        doclens = np.array([len(t) for t in toks], dtype=np.int64)

        nt = int(rng.integers(1, 4))
        terms = tuple(str(t) for t in rng.choice(VOCAB, size=nt))
        slops = tuple(int(rng.choice([1, 1, 2, WILDCARD_SLOP]))
                      for _ in range(nt - 1))
        pm = PatternMatcher(terms, slops,
                            anchor_start=bool(rng.random() < 0.3),
                            anchor_end=bool(rng.random() < 0.3))

        cand = np.arange(n_docs, dtype=np.int64)
        tps = [_tp_from_rows(p, t) for t in terms]
        got = pattern_mask(tps, cand, pm.slops, pm.anchor_start,
                           pm.anchor_end,
                           doclen_fn=lambda c: doclens[c])
        want = np.array([_brute_pattern(toks[d], pm)
                         for d in range(n_docs)])
        np.testing.assert_array_equal(got, want), \
            f"seed {base_seed + trial} pattern {pm}"


def test_segment_topk_pattern_boost_and_discard():
    texts = [
        "alpha beta gamma",      # 0: alpha..gamma in order
        "gamma beta alpha",      # 1: reversed
        "alpha zeta zeta gamma",  # 2: wildcard gap
        "beta alpha gamma",      # 3: starts with beta
        "alpha gamma beta",      # 4: ends with beta
    ]
    n = len(texts)
    rows = build_segment_rows(np.arange(n, dtype=np.int64), texts,
                              segment_id=0)
    p = rows[rows["kind"] == "p"]
    toks = [tokenize(t) for t in texts]
    doclens = np.array([len(t) for t in toks], dtype=np.int64)
    avgfn = sum(len(t) for t in toks) / n
    w = Bm25Weight(n, n, avgfn)
    tp_alpha = _tp_from_rows(p, "alpha")

    def pat_spec(s):
        pm = parse_pattern(s)
        return ("pat", [_tp_from_rows(p, t) for t in pm.terms],
                pm.slops, pm.anchor_start, pm.anchor_end,
                lambda c: doclens[c])

    # boost docs matching "alpha * gamma" (0, 2, 4? -> 4 has gamma
    # before... alpha(0) gamma(1): alpha <= gamma holds -> 4 matches)
    docs, scores = segment_topk(
        [("term", tp_alpha, w)], [], k=n,
        boost_specs=[(1.0, pat_spec("alpha * gamma"))])
    base_docs, base_scores = segment_topk([("term", tp_alpha, w)], [],
                                          k=n)
    by = dict(zip(docs.tolist(), scores.tolist()))
    base = dict(zip(base_docs.tolist(), base_scores.tolist()))
    for d in range(n):
        matched = _brute_pattern(toks[d], parse_pattern("alpha * gamma"))
        np.testing.assert_allclose(
            by[d], base[d] * (2.0 if matched else 1.0), rtol=1e-6)

    # discard docs starting with alpha ("|alpha")
    docs, _ = segment_topk([("term", tp_alpha, w)],
                           [pat_spec("|alpha")], k=n)
    assert set(docs.tolist()) == {
        d for d in range(n) if toks[d][0] != "alpha"}

    # anchor-end discard: docs ending with beta
    docs, _ = segment_topk([("term", tp_alpha, w)],
                           [pat_spec("beta |")], k=n)
    assert set(docs.tolist()) == {
        d for d in range(n) if toks[d][-1] != "beta"}

    # matcher_mask "and" combination: pattern + attribute-style term
    spec = ("and", [pat_spec("alpha * gamma"),
                    [_tp_from_rows(p, "beta")]])
    m = matcher_mask(spec, np.arange(n, dtype=np.int64))
    for d in range(n):
        assert m[d] == (_brute_pattern(toks[d],
                                       parse_pattern("alpha * gamma"))
                        and "beta" in toks[d])
