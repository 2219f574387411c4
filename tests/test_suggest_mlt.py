"""Spell suggestion (web-spell analog) and more-like-this (tantivy
MoreLikeThisQuery analog): engine vs brute force and vs the DuckDB
oracle SQL."""

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_pdf():
    rng = np.random.default_rng(17)
    vocab = ["merge", "table", "window", "scan", "sort", "key",
             "batch", "stream", "index", "query"]
    rows = []
    for i in range(300):
        n = int(rng.integers(4, 12))
        rows.append((i, " ".join(rng.choice(vocab, n))))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def sreader(spark, docs_pdf, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    out = str(tmp_path_factory.mktemp("idx_sugg"))
    build_index(spark, spark.createDataFrame(docs_pdf), out,
                doc_id_col="doc_id", rows_per_segment=100)
    return IndexReader(spark, out)


def _brute_suggest(docs_pdf, token, d, k):
    from collections import Counter

    from cuely_spark.queryengine.executor import _lev_scalar

    df = Counter()
    for t in docs_pdf.text:
        for w in set(t.split()):
            df[w] += 1
    cands = [(ed, -f, w) for w, f in df.items()
             if (ed := _lev_scalar(token, w)) <= d and w != token]
    return [(w, ed, -nf) for ed, nf, w in sorted(cands)[:k]]


def test_suggest_terms_matches_brute_force(sreader, docs_pdf):
    for tok, d in (("mergr", 1), ("tabel", 2), ("quary", 2),
                   ("sort", 2), ("zzzzzz", 2)):
        got = sreader.suggest_terms(tok, d=d, k=3)
        assert got == _brute_suggest(docs_pdf, tok, d, 3), tok


def test_suggest_terms_matches_duckdb_oracle(sreader, docs_pdf):
    from cuely_spark.oracle_sql import suggest_sql

    con = duckdb.connect()
    con.register("documents", docs_pdf)
    toks = ["mergr", "tabel"]
    want = con.execute(suggest_sql(toks, d=2, k=3)).fetchall()
    got = []
    for tok in toks:
        for t, ed, df in sreader.suggest_terms(tok, d=2, k=3):
            got.append((tok, t, ed, df))
    got.sort(key=lambda r: (r[0], r[2], -r[3], r[1]))
    assert [tuple(r) for r in want] == got


def test_suggest_paths_agree(sreader):
    """Sidecar (d<=2) and distributed paths must reproduce the scan."""
    import os
    import shutil

    toks = ["mergr", "tabel", "quary"]
    base = {t: sreader.suggest_terms(t, d=2, k=3) for t in toks}
    side = os.path.join(sreader.path, "fuzzy_deletes")
    shutil.rmtree(side, ignore_errors=True)
    try:
        sreader.build_fuzzy_sidecar(max_d=2)
        for t in toks:
            assert sreader.suggest_terms(t, d=2, k=3) == base[t], t
    finally:
        shutil.rmtree(side, ignore_errors=True)
    old = sreader.vocab_scan_threshold
    sreader.vocab_scan_threshold = 1  # force distributed
    try:
        for t in toks:
            assert sreader.suggest_terms(t, d=2, k=3) == base[t], t
    finally:
        sreader.vocab_scan_threshold = old


def test_suggest_whole_query(sreader):
    corrected, sugg = sreader.suggest("mergr table")
    assert corrected == "merge table"
    assert "mergr" in sugg and sugg["mergr"][0][0] == "merge"
    # fully-known query is untouched, no suggestions
    corrected, sugg = sreader.suggest("merge table")
    assert corrected == "merge table" and sugg == {}


def test_more_like_this_matches_duckdb_oracle(sreader, docs_pdf):
    from cuely_spark.oracle_sql import mlt_sql

    con = duckdb.connect()
    con.register("documents", docs_pdf)
    for src_doc in (0, 7, 42):
        got = sreader.more_like_this(src_doc, max_terms=5,
                                     k=sreader.num_docs)
        got = sorted((r["doc_id"], round(r["score"], 4))
                     for r in got.collect())
        want = sorted(con.execute(
            mlt_sql(src_doc, max_terms=5, k=None)).fetchall())
        assert [d for d, _ in got] == [d for d, _ in want], src_doc
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in want], atol=2e-4)


def test_more_like_this_self_is_top(sreader):
    res = sreader.more_like_this(3, max_terms=8, k=5).collect()
    assert res[0]["doc_id"] == 3  # the source doc matches best

    with pytest.raises(ValueError):
        sreader.more_like_this(10**9)


def _brute_suggest_osa(docs_pdf, token, d, k):
    from collections import Counter

    from cuely_spark.queryengine.executor import _osa_scalar

    df = Counter()
    for t in docs_pdf.text:
        for w in set(t.split()):
            df[w] += 1
    cands = [(ed, -f, w) for w, f in df.items()
             if (ed := _osa_scalar(token, w, transpose=True)) <= d
             and w != token]
    return [(w, ed, -nf) for ed, nf, w in sorted(cands)[:k]]


def test_suggest_transpositions_matches_brute_force(sreader, docs_pdf):
    # 'emrge' is one SWAP from 'merge' (OSA ed 1, plain Lev ed 2):
    # with transpositions it must rank merge at distance 1
    for tok, d in (("emrge", 1), ("tabel", 2), ("soqt", 1)):
        got = sreader.suggest_terms(tok, d=d, k=3, transpositions=True)
        assert got == _brute_suggest_osa(docs_pdf, tok, d, 3), tok
    assert sreader.suggest_terms("emrge", d=1, k=3,
                                 transpositions=True)[0][:2] == \
        ("merge", 1)
    # plain Levenshtein can't see the swap at d=1
    assert all(t != "merge" for t, _, _ in
               sreader.suggest_terms("emrge", d=1, k=3))


def test_suggest_transpositions_paths_agree(sreader):
    import os
    import shutil

    toks = ["emrge", "tabel"]
    base = {t: sreader.suggest_terms(t, d=2, k=3, transpositions=True)
            for t in toks}
    side = os.path.join(sreader.path, "fuzzy_deletes")
    shutil.rmtree(side, ignore_errors=True)
    try:
        sreader.build_fuzzy_sidecar(max_d=2)
        for t in toks:
            assert sreader.suggest_terms(
                t, d=2, k=3, transpositions=True) == base[t], t
    finally:
        shutil.rmtree(side, ignore_errors=True)
    old = sreader.vocab_scan_threshold
    sreader.vocab_scan_threshold = 1  # force distributed
    try:
        for t in toks:
            assert sreader.suggest_terms(
                t, d=2, k=3, transpositions=True) == base[t], t
    finally:
        sreader.vocab_scan_threshold = old


def test_suggest_query_transpositions(sreader):
    corrected, _ = sreader.suggest("emrge table", d=1,
                                   transpositions=True)
    assert corrected == "merge table"
