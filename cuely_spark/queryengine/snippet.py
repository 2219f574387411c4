"""Snippet generation: best-window passage extraction + highlighting.

Reference semantics (crates/core/src/snippet.rs:35-210): the document
text is split into passages, each passage scored against the query
terms, and the best one returned with matched terms highlighted. Here:
a sliding token window is scored by sum of matched-term idf (rarer
query terms dominate, as in the reference's per-passage BM25); the
earliest best window wins; matches are wrapped in <b></b>.

Post-retrieval path: runs on <= k result rows, so a plain Python pass is
the right tool (the reference likewise snippets only the result page).
"""

from __future__ import annotations

import numpy as np

from ..tokenizer import tokenize
from .parser import ParsedQuery, parse_query


def make_snippet(text: str, query: str | ParsedQuery,
                 idf_by_term: dict[str, float] | None = None,
                 window: int = 24, max_chars: int = 200) -> str:
    pq = parse_query(query) if isinstance(query, str) else query
    qterms = {t for c in pq.positive for t in c.tokens
              if c.kind != "filter"}
    toks = tokenize(text)
    if not toks or not qterms:
        return text[:max_chars]
    tok_arr = np.asarray(toks, dtype=object)
    if not any(t in qterms for t in toks):
        return text[:max_chars]
    n = len(toks)
    w = min(window, n)
    # window score = sum over query terms (sorted order) of
    # idf_t * (exact integer count of t in the window). Integer prefix
    # counts keep window sums float-exact, so argmax ties resolve
    # identically in any engine (np.cumsum vs SQL segment-tree window
    # sums disagree in the last ulp otherwise); earliest max wins.
    sums = np.zeros(n - w + 1, dtype=np.float64)
    for t in sorted(qterms):
        idf = float((idf_by_term or {}).get(t, 1.0))
        cnt = np.concatenate(
            [[0], np.cumsum((tok_arr == t).astype(np.int64))])
        sums += idf * (cnt[w:] - cnt[:-w]).astype(np.float64)
    start = int(np.argmax(sums))
    chosen = toks[start:start + w]
    out = []
    for t in chosen:
        out.append(f"<b>{t}</b>" if t in qterms else t)
    snippet = " ".join(out)
    if len(snippet) > max_chars + 7 * sum(1 for t in chosen if t in qterms):
        snippet = snippet[:max_chars] + "…"
    prefix = "… " if start > 0 else ""
    suffix = " …" if start + w < n else ""
    return f"{prefix}{snippet}{suffix}"


def with_snippets(df, reader, query, text_col: str = "text",
                  out_col: str = "snippet"):
    """Add a snippet column to a (small) result DataFrame that has the
    document text. idfs come from the reader's term stats."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    pq = parse_query(query) if isinstance(query, str) else query
    terms = pq.all_terms()
    dfs = reader.term_dfs(terms)
    n = reader.num_docs
    idfs = {t: float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
            for t, df in dfs.items() if df > 0}

    @F.pandas_udf(T.StringType())
    def _snip(texts):
        # same per-row function as ever — the pandas UDF only changes
        # the transport (Arrow batches instead of pickled rows),
        # removing the one row-at-a-time Python UDF in the package
        return texts.map(
            lambda t: make_snippet(t, pq, idf_by_term=idfs))

    return df.withColumn(out_col, _snip(F.col(text_col)))
