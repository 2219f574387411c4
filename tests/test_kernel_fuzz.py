"""Randomized full-surface kernel fuzz: segment_topk with every clause
shape combined (must terms, or-groups, phrases, mustnot groups, should
terms/phrases) over real encoded segments, compared to an independent
brute-force model built from the same tokenizer + BM25 weights."""

import numpy as np
import pytest

from cuely_spark.bm25 import Bm25Weight
from cuely_spark.indexer.segment import build_segment_rows
from cuely_spark.queryengine.kernel import PhraseTps, segment_topk
from cuely_spark.tokenizer import tokenize

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "iota", "kappa"]


def _corpus(rng, n_docs):
    texts = []
    for _ in range(n_docs):
        n = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(VOCAB, size=n)))
    return texts


def _tp_from_rows(p, term):
    from cuely_spark.queryengine.kernel import TermPostings

    g = p[p["term"] == term].sort_values("block_id")
    return TermPostings(
        g["first_doc"].to_numpy(), g["last_doc"].to_numpy(),
        g["ndocs"].to_numpy(), list(g["docs"]), list(g["tfs"]),
        list(g["fnids"]), positions=list(g["positions"]),
        block_max_tf=g["block_max_tf"].to_numpy(),
        block_min_fnid=g["block_min_fnid"].to_numpy())


def _brute_phrase_tf(tt, words, slop=0):
    """Reference phrase counter over a raw token list. slop > 0 follows
    the budgeted-chain DP spec (kernel._phrase_tf_slop docstring):
    frontier of adjusted positions -> min accumulated |delta|."""
    if slop == 0:
        n = 0
        for i in range(len(tt) - len(words) + 1):
            if tt[i:i + len(words)] == list(words):
                n += 1
        return n
    n_w = len(words)
    front = {i + (n_w - 1): 0
             for i, t in enumerate(tt) if t == words[0]}
    for off in range(1, n_w):
        nxt = {}
        for i, t in enumerate(tt):
            if t != words[off]:
                continue
            a = i + (n_w - 1 - off)
            best = min((s + abs(a - fa) for fa, s in front.items()
                        if s + abs(a - fa) <= slop), default=None)
            if best is not None:
                nxt[a] = best
        front = nxt
        if not front:
            break
    return len(front)


def _brute(texts, weights, must_groups, phrases, negs, shoulds,
           should_phrases, k):
    """Independent model: must_groups = list of term-lists (any member
    must match); phrases/should_phrases as ((tokens...), slop) pairs;
    negs/shoulds as term tuples."""
    f32 = np.float32
    toks = [tokenize(t) for t in texts]

    def tf(d, term):
        return toks[d].count(term)

    def phrase_tf_(d, words, slop=0):
        return _brute_phrase_tf(toks[d], words, slop)

    out = {}
    for d in range(len(texts)):
        ok = all(any(tf(d, m) > 0 for m in grp) for grp in must_groups)
        ok = ok and all(phrase_tf_(d, ph, sl) > 0
                        for ph, sl in phrases)
        for grp in negs:
            if grp and all(tf(d, t) > 0 for t in grp):
                ok = False
        if not ok:
            continue
        s = f32(0.0)
        for grp in must_groups:
            for m in grp:
                x = tf(d, m)
                if x:
                    s = f32(s + weights[m].score(
                        np.array([wfn(toks[d])]), np.array([x]))[0])
        for ph, sl in phrases:
            x = phrase_tf_(d, ph, sl)
            s = f32(s + weights[("ph", ph)].score(
                np.array([wfn(toks[d])]), np.array([x]))[0])
        for t in shoulds:
            x = tf(d, t)
            if x:
                s = f32(s + weights[t].score(
                    np.array([wfn(toks[d])]), np.array([x]))[0])
        for ph, sl in should_phrases:
            x = phrase_tf_(d, ph, sl)
            if x:
                s = f32(s + weights[("ph", ph)].score(
                    np.array([wfn(toks[d])]), np.array([x]))[0])
        out[d] = s
    ranked = sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [d for d, _ in ranked], np.array([s for _, s in ranked],
                                            dtype=f32)


def wfn(tokens):
    from cuely_spark.fieldnorm import fieldnorm_to_id

    return fieldnorm_to_id(np.array([len(tokens)]))[0]


@pytest.mark.parametrize("base_seed", [0, 1000, 2000])
def test_kernel_full_surface_fuzz(base_seed):
    for trial in range(60):
        rng = np.random.default_rng(base_seed + trial)
        n_docs = int(rng.integers(5, 250))
        texts = _corpus(rng, n_docs)
        rows = build_segment_rows(
            np.arange(n_docs, dtype=np.int64), texts, segment_id=0)
        p = rows[rows["kind"] == "p"]
        toks = [tokenize(t) for t in texts]
        avgfn = (sum(len(t) for t in toks) / n_docs) or 1.0

        def df(term):
            return sum(1 for t in toks if term in t)

        def w_of(term):
            return Bm25Weight(max(df(term), 0), n_docs, avgfn)

        # random query shape
        must_groups = []
        for _ in range(int(rng.integers(1, 3))):
            grp = list(rng.choice(VOCAB, size=int(rng.integers(1, 3)),
                                  replace=False))
            must_groups.append(grp)
        phrases = []
        if rng.random() < 0.4:
            nw = int(rng.choice([2, 2, 3]))
            slop = int(rng.choice([0, 0, 1, 2, 3, 5]))
            phrases.append((tuple(rng.choice(VOCAB, size=nw)), slop))
        negs = []
        if rng.random() < 0.4:
            negs.append([str(x) for x in
                         rng.choice(VOCAB, size=int(rng.integers(1, 3)),
                                    replace=False)])
        shoulds = ([str(rng.choice(VOCAB))]
                   if rng.random() < 0.5 else [])
        should_phrases = (
            [(tuple(rng.choice(VOCAB, size=2)),
              int(rng.choice([0, 1, 2])))]
            if rng.random() < 0.3 else [])
        k = int(rng.integers(1, 30))

        weights = {}
        for grp in must_groups:
            for m in grp:
                weights[m] = w_of(m)
        for t in shoulds:
            weights[t] = w_of(t)
        for ph, _sl in list(phrases) + list(should_phrases):
            w = Bm25Weight(1, n_docs, avgfn)
            s = np.float32(0.0)
            for t in ph:
                weights.setdefault(t, w_of(t))
                s = np.float32(s + weights[t].weight)
            w.weight = s
            weights[("ph", ph)] = w

        empty_ok = True
        specs = []
        for grp in must_groups:
            members = [(_tp_from_rows(p, m), weights[m]) for m in grp]
            if len(grp) == 1:
                specs.append(("term", members[0][0], members[0][1]))
                if members[0][0].nblocks == 0:
                    empty_ok = False
            else:
                specs.append(("or", members, None))
                if all(tp.nblocks == 0 for tp, _ in members):
                    empty_ok = False
        for ph, sl in phrases:
            tps = PhraseTps([_tp_from_rows(p, t) for t in ph], slop=sl)
            specs.append(("phrase", tps, weights[("ph", ph)]))
            if any(tp.nblocks == 0 for tp in tps):
                empty_ok = False
        neg_specs = [[_tp_from_rows(p, t) for t in grp] for grp in negs]
        sspecs = [("term", _tp_from_rows(p, t), weights[t])
                  for t in shoulds]
        sspecs += [("phrase",
                    PhraseTps([_tp_from_rows(p, t) for t in ph],
                              slop=sl),
                    weights[("ph", ph)]) for ph, sl in should_phrases]

        got_d, got_s = segment_topk(specs, neg_specs, k=k,
                                    should_specs=sspecs)
        exp_d, exp_s = _brute(texts, weights, must_groups, phrases,
                              negs, shoulds, should_phrases, k)
        if not empty_ok:
            exp_d, exp_s = [], np.empty(0, dtype=np.float32)
        assert got_d.tolist() == exp_d, f"seed {base_seed + trial}"
        np.testing.assert_array_equal(got_s, exp_s)

        # count_matches (shoulds never gate): full == brute full count;
        # short-circuited == min(full, cap) for caps below/at/above full
        from cuely_spark.queryengine.kernel import count_matches

        def brute_count():
            n = 0
            for d in range(n_docs):
                ok = all(any(toks[d].count(m) > 0 for m in grp)
                         for grp in must_groups)
                for ph, sl in phrases:
                    ok = ok and _brute_phrase_tf(toks[d], ph, sl) > 0
                for grp in negs:
                    if grp and all(toks[d].count(t) > 0 for t in grp):
                        ok = False
                n += int(ok)
            return n

        full = brute_count() if empty_ok else 0
        assert count_matches(specs, neg_specs) == full
        for cap in (1, max(1, full // 2), full or 1, full + 5):
            assert count_matches(specs, neg_specs, max_docs=cap) \
                == min(full, cap), f"seed {base_seed + trial} cap {cap}"


@pytest.mark.parametrize("base_seed", [5000])
def test_kernel_optic_fuzz(base_seed):
    """Randomized optic-rule fuzz over segment_topk: boost/downrank
    accumulation + DiscardNonMatching gate vs a brute-force model
    (reference multiplier semantics, computer/mod.rs:471-497)."""
    from cuely_spark.queryengine.kernel import segment_topk

    for trial in range(40):
        rng = np.random.default_rng(base_seed + trial)
        n_docs = int(rng.integers(5, 200))
        texts = _corpus(rng, n_docs)
        rows = build_segment_rows(
            np.arange(n_docs, dtype=np.int64), texts, segment_id=0)
        p = rows[rows["kind"] == "p"]
        toks = [tokenize(t) for t in texts]
        avgfn = (sum(len(t) for t in toks) / n_docs) or 1.0

        def df(term):
            return sum(1 for t in toks if term in t)

        must = str(rng.choice(VOCAB))
        w = Bm25Weight(df(must), n_docs, avgfn)
        tp_must = _tp_from_rows(p, must)
        if tp_must.nblocks == 0:
            continue

        n_rules = int(rng.integers(1, 4))
        rules = []
        for _ in range(n_rules):
            terms = list(rng.choice(VOCAB, size=int(rng.integers(1, 3)),
                                    replace=False))
            factor = float(rng.choice([-3.0, -1.5, 0.5, 1.0, 2.0]))
            rules.append((factor, [str(t) for t in terms]))
        dnm = bool(rng.random() < 0.4)

        bspecs = [(f, [_tp_from_rows(p, t) for t in ts])
                  for f, ts in rules]
        req = [tps for _, tps in bspecs] if dnm else None
        got_d, got_s = segment_topk(
            [("term", tp_must, w)], [], k=n_docs,
            boost_specs=bspecs, require_any=req)

        # brute force
        f32 = np.float32
        exp = {}
        for d in range(n_docs):
            tf = toks[d].count(must)
            if tf == 0:
                continue
            matched = [f for f, ts in rules
                       if all(t in toks[d] for t in ts)]
            if dnm and not matched:
                continue
            boost = sum(f for f in matched if f >= 0)
            down = sum(-f for f in matched if f < 0)
            mult = (1.0 / (1.0 + down - boost) if down > boost
                    else boost - down + 1.0)
            base = f32(w.score(np.array([wfn(toks[d])]),
                               np.array([tf]))[0])
            exp[d] = f32(np.float64(base) * mult)
        ranked = sorted(exp.items(), key=lambda x: (-x[1], x[0]))
        assert got_d.tolist() == [d for d, _ in ranked], \
            f"seed {base_seed + trial}"
        np.testing.assert_array_equal(
            got_s, np.array([s for _, s in ranked], dtype=f32))
