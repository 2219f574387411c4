"""Autosuggest — the search-bar completion dropdown.

Reference: /root/reference/crates/core/src/autosuggest.rs — an fst of
popular key phrases with a score table; `suggestions(q)`:

1. ascii-lowercase the query (autosuggest.rs:54),
2. prefix-stream matching phrases from the fst in LEXICOGRAPHIC order
   and take the first 64 (autosuggest.rs:55-63 — the cap applies
   before scoring, on fst stream order),
3. rank those by score desc with a STABLE sort, keep 10
   (autosuggest.rs:70-75; Rust `sort_by` is stable, so equal scores
   keep lexicographic order),
4. return the 10 sorted alphabetically (autosuggest.rs:74-77).

Here the phrase store is the index's key-phrase table
(IndexReader.top_key_phrases — the KeyPhrase/TopKeyPhrases analog the
reference builds its fst from): a bounded top-k list held in memory
exactly like the reference's fst, with the sorted-list bisect standing
in for the fst prefix automaton. The heavy work (key-phrase scoring
over the corpus) is the distributed part; the suggester itself is a
driver-side lookup structure sized by `k`, corpus-independent.
"""

from __future__ import annotations

import bisect

__all__ = ["Autosuggest"]

_STREAM_CAP = 64  # autosuggest.rs:63 `.take(64)` on the fst stream
_TOP_K = 10       # autosuggest.rs:75 `.take(10)`


def _ascii_lower(s: str) -> str:
    """Rust `to_ascii_lowercase`: only A-Z fold, other chars verbatim."""
    return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c
                   for c in s)


class Autosuggest:
    def __init__(self, phrases: list[tuple[str, float]]):
        """phrases: (text, score) pairs; duplicates collapse keeping
        the last score (autosuggest.rs:37-47 inserts into a map then
        dedups the sorted key list)."""
        self._scores = {t: float(s) for t, s in phrases}
        self._terms = sorted(self._scores)

    @classmethod
    def from_key_phrases(cls, reader, k: int = 1000) -> "Autosuggest":
        """Build from the index's top-k key phrases (the reference
        builds its fst from indexed KeyPhrases,
        autosuggest.rs:36-51)."""
        rows = reader.top_key_phrases(k=k).collect()
        return cls([(r["term"], r["score"]) for r in rows])

    def suggestions(self, query: str, k: int = _TOP_K,
                    stream_cap: int = _STREAM_CAP) -> list[str]:
        q = _ascii_lower(query)
        lo = bisect.bisect_left(self._terms, q)
        cands = []
        for t in self._terms[lo:lo + stream_cap]:
            if not t.startswith(q):
                break
            cands.append(t)
        # stable by score desc over the lexicographic stream
        ranked = sorted(cands, key=lambda t: -self._scores[t])
        return sorted(ranked[:k])

    def scores(self) -> dict[str, float]:
        return dict(self._scores)
