"""Fuzzy term queries (`word~N`): parser, dictionary expansion, and
rank parity between the local and distributed paths."""

import numpy as np
import pytest

from cuely_spark.queryengine.parser import parse_query


def test_parser_fuzzy_forms():
    pq = parse_query("quer~1 table")
    assert pq.clauses[0].kind == "term"
    assert pq.clauses[0].fuzzy == 1
    assert pq.clauses[1].fuzzy == 0
    # cap at 2; ~0 is not fuzzy; non-numeric suffix is a plain split
    assert parse_query("word~9").clauses[0].fuzzy == 2
    assert parse_query("word~0").clauses[0].fuzzy == 0
    pq = parse_query("word~x")
    assert all(c.fuzzy == 0 for c in pq.clauses)
    # quoted phrases keep slop semantics, not fuzzy
    pq = parse_query('"a b"~1')
    assert pq.clauses[0].kind == "phrase" and pq.clauses[0].slop == 1


@pytest.fixture(scope="module")
def reader(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    out = str(tmp_path_factory.mktemp("idx_fuzzy"))
    build_index(spark, df, out, rows_per_segment=1200)
    return IndexReader(spark, out)


def test_fuzzy_terms_expansion(reader):
    # exact term is always its own neighbor; expansion ordered df desc
    terms = reader.fuzzy_terms("test", 1)
    assert "test" in terms
    dfs = reader.term_dfs(terms)
    assert all(dfs[t] > 0 for t in terms)
    # every expansion is within the Levenshtein budget

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    for t in terms:
        assert ed("test", t) <= 1, t
    # d=2 is a superset of d=1
    t2 = set(reader.fuzzy_terms("test", 2))
    assert set(terms) <= t2 or len(terms) == reader.max_fuzzy_expansions


def test_fuzzy_search_recovers_typo(reader, oracle_small):
    # "tset"-like typo: query a term absent from the corpus whose
    # neighbor exists; membership comes entirely from the expansion
    d_typo, _ = reader.search_collect("tst~1", k=20)
    assert d_typo.size > 0
    # exact-term query results are a subset-ish sanity: every doc
    # matching plain "test" matches the fuzzy group too
    d_exact, _ = reader.search_collect("test", k=reader.num_docs)
    d_fuzzy, _ = reader.search_collect("test~1", k=reader.num_docs)
    assert set(d_exact.tolist()) <= set(d_fuzzy.tolist())


def test_fuzzy_local_matches_distributed(reader):
    dl, sl = reader.search_local("test~1 the", k=25)
    rows = reader.search("test~1 the", k=25).collect()
    assert dl.tolist() == [r["doc_id"] for r in rows]
    np.testing.assert_allclose(sl, [r["score"] for r in rows],
                               rtol=1e-6)


def test_parser_prefix_and_regex_forms():
    pq = parse_query("merg* table")
    assert pq.clauses[0].prefix and pq.clauses[0].tokens == ("merg",)
    assert not pq.clauses[1].prefix
    pq = parse_query("/s(can|ort)/ table")
    assert pq.clauses[0].regex
    assert pq.clauses[0].tokens == ("s(can|ort)",)
    with pytest.raises(ValueError):
        parse_query("/bad(/")
    # a bare '*' or '/' is not an expansion form
    pq = parse_query("a * b")
    assert all(not c.prefix and not c.regex for c in pq.clauses)


def test_regex_lowercases_literals_but_not_escapes():
    # literal letters fold to the lowercase dictionary...
    pq = parse_query("/SC(AN|an)/")
    assert pq.clauses[0].tokens == ("sc(an|an)",)
    # ...but backslash escapes keep their (case-significant) meaning:
    # \S must NOT become \s (inverted class), \B not \b, \W not \w
    pq = parse_query(r"/\S+X/")
    assert pq.clauses[0].tokens == (r"\S+x",)
    pq = parse_query(r"/A\Wb\\Q/")
    assert pq.clauses[0].tokens == (r"a\Wb\\q",)


def test_prefix_and_regex_expansion(reader):
    pre = reader.prefix_terms("th")
    assert pre and all(t.startswith("th") for t in pre)
    rx = reader.regex_terms("th(e|is)")
    assert set(rx) <= {"the", "this"} and rx
    # prefix search: superset of the exact-term result
    d_exact, _ = reader.search_collect("test", k=reader.num_docs)
    d_pre, _ = reader.search_collect("tes*", k=reader.num_docs)
    assert set(d_exact.tolist()) <= set(d_pre.tolist())


def test_prefix_local_matches_distributed(reader):
    dl, sl = reader.search_local("tes* the", k=25)
    rows = reader.search("tes* the", k=25).collect()
    assert dl.tolist() == [r["doc_id"] for r in rows]
    np.testing.assert_allclose(sl, [r["score"] for r in rows],
                               rtol=1e-6)


def test_phrase_prefix_local_matches_distributed(reader):
    dl, sl = reader.search_local('"the te"* website', k=25)
    rows = reader.search('"the te"* website', k=25).collect()
    assert dl.tolist() == [r["doc_id"] for r in rows]
    np.testing.assert_allclose(sl, [r["score"] for r in rows],
                               rtol=1e-6)
    assert dl.size > 0


def test_estimators_reject_expansion_clauses(reader):
    # df-based estimators would silently return 0 for a prefix token
    # with df 0; they must refuse instead
    for q in ("tes*", "test~1", '"the te"*', "/te.t/"):
        with pytest.raises(ValueError):
            reader.approx_count(q)
        with pytest.raises(ValueError):
            reader.approx_count_hybrid(q)
    # count() stays the exact path for these
    assert reader.count("tes* the") > 0


def test_batch_parity_for_expansion_queries(reader):
    """search_many must give the same per-query rankings as search()
    for the round-4 query shapes (expansions happen at plan time, so
    the batch kernel sees identical specs)."""
    batch = {
        "fz": "test~1 the",
        "pre": "tes* the",
        "php": '"the te"* website',
        "slop": '"test website"~2',
    }
    res = reader.search_many(batch, k=15).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for name, q in batch.items():
        rows = reader.search(q, k=15).collect()
        want = [(i + 1, r["doc_id"]) for i, r in enumerate(rows)]
        got = [(rk, d) for rk, d, _ in sorted(by_q.get(name, []))]
        assert got == want, name


def test_fuzzy_sidecar_matches_scan(reader):
    """The SymSpell deletion sidecar must return EXACTLY the linear
    scan's ed<=1 expansion (intersecting neighborhoods + DP verify),
    for present, absent, and short tokens."""
    # scan baseline first (no sidecar on disk yet)
    import os
    import shutil

    side = os.path.join(reader.path, "fuzzy_deletes")
    shutil.rmtree(side, ignore_errors=True)
    tokens = ["test", "tst", "the", "websit", "a", "zzz"]
    scan = {t: reader.fuzzy_terms(t, 1) for t in tokens}
    try:
        reader.build_fuzzy_sidecar()
        for t in tokens:
            assert reader.fuzzy_terms(t, 1) == scan[t], t
        # d=2 still takes the scan path (superset of d=1)
        assert set(scan["tst"]) <= set(reader.fuzzy_terms("tst", 2))
    finally:
        shutil.rmtree(side, ignore_errors=True)


def test_expansion_cap_drops_base_term(spark, tmp_path):
    """>50 dictionary matches: the or-group's member set is EXACTLY the
    (df desc, term asc) top-50 — the base token is NOT an implicit 51st
    member when it falls outside the cap (tantivy expansion semantics;
    the DuckDB oracle models the same set)."""
    import duckdb
    import pandas as pd

    from cuely_spark.indexer import build_index
    from cuely_spark.oracle_sql import bm25_search_sql
    from cuely_spark.queryengine import IndexReader

    rows = []
    doc_id = 0
    # 60 prefix terms, df=2 each -> top-50 keeps aa00..aa49 (term asc
    # on the df tie); the base term "aa" itself has df=1 -> OUTSIDE cap
    for i in range(60):
        for _ in range(2):
            rows.append((doc_id, f"aa{i:02d} filler")); doc_id += 1
    rows.append((doc_id, "aa filler")); base_doc = doc_id
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = str(tmp_path / "idx_cap")
    build_index(spark, spark.createDataFrame(pdf), out,
                doc_id_col="doc_id", rows_per_segment=50)
    r = IndexReader(spark, out)

    exp = r.prefix_terms("aa")
    assert len(exp) == 50
    assert exp == [f"aa{i:02d}" for i in range(50)]
    assert "aa" not in exp

    docs, _ = r.search_collect("aa*", k=r.num_docs)
    assert base_doc not in docs.tolist()
    assert set(docs.tolist()) == set(range(100))  # aa00..aa49 docs

    con = duckdb.connect()
    con.register("documents", pdf)
    got = (con.execute(bm25_search_sql("aa*", k=None)).df()
           .sort_values("doc_id").reset_index(drop=True))
    dd, ss = r.search_collect("aa*", k=r.num_docs, dtype=np.float64)
    order = np.argsort(dd)
    assert got["doc_id"].tolist() == dd[order].tolist()
    np.testing.assert_allclose(got["score"], np.round(ss[order], 4),
                               atol=2e-4)


def test_fuzzy_sidecar_d2_matches_scan(reader):
    """max_d=2 sidecar: depth-2 deletion neighborhoods + DP verify must
    equal the linear-scan ed<=2 expansion for d in {1, 2}."""
    import os
    import shutil

    side = os.path.join(reader.path, "fuzzy_deletes")
    shutil.rmtree(side, ignore_errors=True)
    tokens = ["test", "tst", "te", "websit", "webs", "zzz"]
    scan1 = {t: reader.fuzzy_terms(t, 1) for t in tokens}
    scan2 = {t: reader.fuzzy_terms(t, 2) for t in tokens}
    try:
        reader.build_fuzzy_sidecar(max_d=2)
        for t in tokens:
            assert reader.fuzzy_terms(t, 1) == scan1[t], ("d1", t)
            assert reader.fuzzy_terms(t, 2) == scan2[t], ("d2", t)
    finally:
        shutil.rmtree(side, ignore_errors=True)


def test_prefix_scan_prunes_row_groups(tmp_path):
    """The prefix expansion must hit only the row-groups whose term
    min/max range intersects [p, p+MAXCHAR) — O(row-group), never a
    full-vocabulary read (the sorted term_stats layout is the FST
    stand-in)."""
    import pyarrow as pa
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    from cuely_spark.queryengine.executor import _MAX_CHAR

    terms = sorted(f"{c}{i:03d}" for c in "abcdefgh" for i in range(200))
    tbl = pa.table({"term": terms,
                    "df": list(range(1, len(terms) + 1)),
                    "ttf": [1] * len(terms)})
    p = tmp_path / "term_stats"
    p.mkdir()
    pq.write_table(tbl, str(p / "part-0.parquet"), row_group_size=100)

    dset = ds.dataset(str(p), format="parquet")
    frag = next(iter(dset.get_fragments()))
    total_rgs = frag.num_row_groups
    assert total_rgs == 16
    flt = (ds.field("term") >= "c") & (ds.field("term") < "c" + _MAX_CHAR)
    pruned = frag.split_by_row_group(flt)
    assert 0 < len(pruned) <= 3  # the 2 'c' groups (+1 boundary)

    # and the reader-level lookup over this layout returns exactly the
    # (df desc, term asc) top-50 of the c-prefixed terms
    from cuely_spark.queryengine.executor import IndexReader

    class _Stub(IndexReader):
        def __init__(self):
            self._term_stats_path = str(p)

    got = _Stub().prefix_terms("c")
    want = sorted((t for t in terms if t.startswith("c")),
                  key=lambda t: (-(terms.index(t) + 1), t))[:50]
    assert got == want
    assert all(t.startswith("c") for t in got) and len(got) == 50


def test_distributed_expansion_matches_driver_scan(spark, tmp_path):
    """Above vocab_scan_threshold the expansion fans out over executors
    — same (df desc, term asc) top-cap as the driver path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cuely_spark.queryengine.executor import IndexReader

    terms = sorted(f"{c}x{i:03d}" for c in "abc" for i in range(300))
    tbl = pa.table({"term": terms,
                    "df": [((i * 7) % 301) + 1
                           for i in range(len(terms))],
                    "ttf": [1] * len(terms)})
    p = tmp_path / "term_stats"
    p.mkdir()
    pq.write_table(tbl, str(p / "part-0.parquet"), row_group_size=128)

    class _Stub(IndexReader):
        def __init__(self):
            self._term_stats_path = str(p)
            self.path = str(tmp_path)  # no sidecar dir -> scan path
            self.spark = spark

    stub = _Stub()
    driver_pre = stub.prefix_terms("bx")
    driver_fz = stub.fuzzy_terms("bx10", 1)
    driver_rx = stub.regex_terms("bx1(0|1).")
    stub2 = _Stub()
    stub2.vocab_scan_threshold = 10  # force the distributed path
    assert stub2.prefix_terms("bx") == driver_pre
    assert stub2.fuzzy_terms("bx10", 1) == driver_fz
    assert stub2.regex_terms("bx1(0|1).") == driver_rx
    assert len(driver_pre) == 50 and driver_fz and driver_rx


def test_fuzzy_transpositions_osa(reader):
    """transpose=True = OSA (adjacent transposition costs 1, the
    Lucene/tantivy transposition_cost_one semantics) — pytest-oracled
    against a brute OSA because DuckDB's damerau_levenshtein is the
    UNRESTRICTED distance (ca->abc = 2 there, 3 under OSA)."""
    from cuely_spark.queryengine.executor import _osa_scalar

    # OSA vs unrestricted-DL corner pin
    assert _osa_scalar("ca", "abc") == 3
    assert _osa_scalar("ab", "ba") == 1

    # 'tset' is a transposition of 'test': d=1 reachable only with OSA
    plain = reader.fuzzy_terms("tset", 1)
    osa = reader.fuzzy_terms("tset", 1, transpose=True)
    assert "test" not in plain and "test" in osa

    # brute-force OSA oracle over the dictionary
    terms = [t for t in reader.prefix_terms("", cap=10**6)
             if ":" not in t]
    for tok, d in (("tset", 1), ("websiet", 2), ("hte", 1)):
        dfs = reader.term_dfs(terms)
        want = sorted(
            ((t for t in terms if _osa_scalar(tok, t) <= d)),
            key=lambda t: (-dfs[t], t))[:50]
        assert reader.fuzzy_terms(tok, d, transpose=True) == want, tok


def test_fuzzy_transpositions_paths_agree(reader):
    import os
    import shutil

    toks = [("tset", 1), ("websiet", 2)]
    side = os.path.join(reader.path, "fuzzy_deletes")
    shutil.rmtree(side, ignore_errors=True)
    base = {t: reader.fuzzy_terms(t, d, transpose=True)
            for t, d in toks}
    try:
        reader.build_fuzzy_sidecar(max_d=2)
        for t, d in toks:
            assert reader.fuzzy_terms(t, d, transpose=True) == base[t]
    finally:
        shutil.rmtree(side, ignore_errors=True)
    old = reader.vocab_scan_threshold
    reader.vocab_scan_threshold = 1
    try:
        for t, d in toks:
            assert reader.fuzzy_terms(t, d, transpose=True) == base[t]
    finally:
        reader.vocab_scan_threshold = old

    # end-to-end: the search kwarg routes the expansion
    d_plain, _ = reader.search_collect("tset~1", k=reader.num_docs)
    dl, _ = reader.search_local("tset~1", k=reader.num_docs,
                                fuzzy_transpositions=True)
    d_exact, _ = reader.search_collect("test", k=reader.num_docs)
    assert set(d_exact.tolist()) <= set(dl.tolist())
    assert not set(d_exact.tolist()) <= set(d_plain.tolist())


def test_osa_property_vs_reference_dp():
    """Hypothesis: _osa_scalar and the vectorized _lev_eds agree with a
    textbook OSA reference on random short strings (and the plain
    Levenshtein path with the transposition row disabled)."""
    from functools import lru_cache

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cuely_spark.queryengine.executor import _lev_eds, _osa_scalar

    def ref_osa(a, b):
        @lru_cache(maxsize=None)
        def d(i, j):
            if i == 0 or j == 0:
                return max(i, j)
            best = min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                       d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                best = min(best, d(i - 2, j - 2) + 1)
            return best
        return d(len(a), len(b))

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abcd", max_size=7),
           st.text(alphabet="abcd", max_size=7))
    def check(a, b):
        want = ref_osa(a, b)
        assert _osa_scalar(a, b) == want
        assert _osa_scalar(a, b, transpose=False) >= want
        d = max(len(a), len(b)) + 1
        eds = _lev_eds([b], a, d, transpose=True)
        assert eds[0] == want

    check()
