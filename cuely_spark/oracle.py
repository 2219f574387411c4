"""Pure-Python/numpy oracle: tokenizer + BM25 + top-k.

This is the rank-identity contract the Spark engine is tested against
(FIXTURES.md §2): same tokenizer, BM25 with k1=1.2/b=0.75,
fieldnorm-quantized doc lengths, float32 accumulation in query-clause
order, and docID-ascending tiebreak. Brute force — no pruning — so it
also serves as the ground truth for WAND-vs-exhaustive property tests
(pattern: /root/reference/crates/tantivy/src/query/boolean_query/
block_wand.rs:301-623).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np

from .bm25 import Bm25Weight
from .fieldnorm import fieldnorm_to_id
from .queryengine.parser import ParsedQuery, parse_query
from .tokenizer import tokenize


class OracleIndex:
    def __init__(self, doc_ids, texts, dtype=np.float32,
                 attr_tokens=None):
        self.dtype = dtype
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        order = np.argsort(self.doc_ids, kind="stable")
        self.doc_ids = self.doc_ids[order]
        texts = [texts[i] for i in order]
        attrs = ([attr_tokens[i] for i in order]
                 if attr_tokens is not None else None)
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        doclens = np.zeros(len(texts), dtype=np.int64)
        for i, (did, text) in enumerate(zip(self.doc_ids, texts)):
            toks = tokenize(text)
            doclens[i] = len(toks)
            for pos, t in enumerate(toks):
                self.postings[t].setdefault(int(did), []).append(pos)
            if attrs is not None:
                # attribute filter terms: tf=1, pos 0, NOT in doclen
                for t in attrs[i]:
                    self.postings[t].setdefault(int(did), []).append(0)
        self.doclens = doclens
        self.fieldnorm_ids = fieldnorm_to_id(doclens)
        self.num_docs = len(texts)
        self.total_tokens = int(doclens.sum())
        self.avg_fieldnorm = self.total_tokens / self.num_docs
        self._fn_by_doc = dict(zip(self.doc_ids.tolist(),
                                   self.fieldnorm_ids.tolist()))

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def _weight(self, doc_freq: int) -> Bm25Weight:
        return Bm25Weight(doc_freq, self.num_docs, self.avg_fieldnorm,
                          dtype=self.dtype)

    def _phrase_docs(self, tokens, slop: int = 0) -> dict[int, int]:
        """doc -> phrase match count (overlaps counted).

        slop > 0: budgeted-chain semantics (kernel._phrase_tf_slop
        docstring) via a per-doc dict DP — deliberately a different
        implementation from the vectorized kernel so property tests
        compare independent code paths."""
        plists = [self.postings.get(t) for t in tokens]
        if any(p is None for p in plists):
            return {}
        docs = set(plists[0])
        for p in plists[1:]:
            docs &= set(p)
        out = {}
        n = len(tokens)
        for d in docs:
            if slop > 0:
                # frontier: adjusted pos -> min accumulated |delta|
                front = {p + (n - 1): 0 for p in plists[0][d]}
                for off, pl in enumerate(plists[1:], start=1):
                    nxt = {}
                    for p in pl[d]:
                        a = p + (n - 1 - off)
                        best = min(
                            (s + abs(a - fa) for fa, s in front.items()
                             if s + abs(a - fa) <= slop),
                            default=None)
                        if best is not None:
                            nxt[a] = best
                    front = nxt
                    if not front:
                        break
                if front:
                    out[d] = len(front)
                continue
            cand = np.asarray(plists[0][d], dtype=np.int64)
            for off, p in enumerate(plists[1:], start=1):
                nxt = np.asarray(p[d], dtype=np.int64) - off
                cand = np.intersect1d(cand, nxt)
                if cand.size == 0:
                    break
            if cand.size:
                out[d] = int(cand.size)
        return out

    def search_should(self, query: str | ParsedQuery, k: int = 20):
        """Scored disjunction (Should): docs matching ANY term clause,
        score = sum over matching clauses in query order."""
        pq = parse_query(query) if isinstance(query, str) else query
        assert all(c.kind == "term" for c in pq.positive)
        d = self.dtype
        clause = []
        cand: set[int] = set()
        for c in pq.positive:
            plist = self.postings.get(c.tokens[0], {})
            tfs = {doc: len(ps) for doc, ps in plist.items()}
            clause.append((self._weight(self.df(c.tokens[0])), tfs))
            cand |= set(tfs)
        for c in pq.negative:
            plists = [set(self.postings.get(t, {})) for t in c.tokens]
            if plists and all(plists):
                cand -= set.intersection(*plists)
        import heapq
        scored = []
        for doc in cand:
            fn = self._fn_by_doc[doc]
            s = d(0.0)
            for w, tfs in clause:
                if doc in tfs:
                    s = d(s + w.score(np.array([fn]),
                                      np.array([tfs[doc]]))[0])
            scored.append((float(s), doc))
        top = heapq.nsmallest(k, scored, key=lambda x: (-x[0], x[1]))
        return (np.array([t[1] for t in top], dtype=np.int64),
                np.array([t[0] for t in top], dtype=self.dtype))

    def search(self, query: str | ParsedQuery, k: int = 20):
        """Return (doc_ids, scores) arrays, rank order, docID tiebreak."""
        pq = parse_query(query) if isinstance(query, str) else query
        # candidate docs and per-clause tf maps
        clause_tfs: list[tuple[Bm25Weight, dict[int, int]]] = []
        cand: set[int] | None = None
        for c in pq.positive:
            if c.kind == "filter":
                docs = set(self.postings.get(c.tokens[0], {}))
                cand = docs if cand is None else (cand & docs)
                continue  # unscored
            if c.kind == "term":
                t = c.tokens[0]
                plist = self.postings.get(t, {})
                tfs = {d: len(ps) for d, ps in plist.items()}
                w = self._weight(self.df(t))
            else:  # phrase
                tfs = self._phrase_docs(c.tokens, c.slop)
                # phrase weight = sum of constituent idfs
                # (reference: crates/tantivy/src/query/bm25.rs:96-131)
                d = self.dtype
                idf_sum = d(0.0)
                for t in c.tokens:
                    idf_sum = d(idf_sum + self._weight(self.df(t)).weight)
                w = self._weight(1)
                w.weight = idf_sum
            clause_tfs.append((w, tfs))
            docs = set(tfs)
            cand = docs if cand is None else (cand & docs)
        for c in pq.negative:
            plists = [set(self.postings.get(t, {})) for t in c.tokens]
            if plists and all(plists):
                excluded = set.intersection(*plists)
                cand -= excluded
        if not cand:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=self.dtype)
        d = self.dtype
        scored = []
        for doc in cand:
            fn = self._fn_by_doc[doc]
            s = d(0.0)
            for w, tfs in clause_tfs:
                s = d(s + w.score(np.array([fn]), np.array([tfs[doc]]))[0])
            scored.append((float(s), doc))
        # top-k: score desc, docID asc tiebreak
        top = heapq.nsmallest(k, scored, key=lambda x: (-x[0], x[1]))
        doc_ids = np.array([t[1] for t in top], dtype=np.int64)
        scores = np.array([t[0] for t in top], dtype=self.dtype)
        return doc_ids, scores

    def count(self, query: str | ParsedQuery) -> int:
        pq = parse_query(query) if isinstance(query, str) else query
        cand: set[int] | None = None
        for c in pq.positive:
            if c.kind in ("term", "filter"):
                docs = set(self.postings.get(c.tokens[0], {}))
            else:
                docs = set(self._phrase_docs(c.tokens, c.slop))
            cand = docs if cand is None else cand & docs
        for c in pq.negative:
            plists = [set(self.postings.get(t, {})) for t in c.tokens]
            if plists and all(plists):
                cand -= set.intersection(*plists)
        return len(cand or ())
