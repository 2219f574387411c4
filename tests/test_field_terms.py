"""Field-scoped scored terms: `title:term` on a multi-field index.

Reference semantics: the tantivy query language scopes a term to a
named field (`field:term`, crates/tantivy/src/query/query_parser/ —
the parsed TermQuery carries that field and is scored with THAT
field's statistics: its doc freq and its average fieldnorm,
bm25.rs:72-79 per-field Bm25Weight::for_one_term). Stract's own
parser only ever emits its fixed site:/intitle: analogs, so this is
the tantivy surface, grafted onto the transcripts schema.

Engine design: the parser emits the field posting KEY
("f:{field}:{token}", indexer/segment.py) directly into the clause,
so postings lookup / kernel / negation treat field terms as opaque
dictionary terms; only Bm25Weight construction consults the field's
df (already keyed) and avg fieldnorm (stats field_tokens).
"""
import duckdb
import numpy as np
import pandas as pd
import pytest

from cuely_spark.queryengine.parser import parse_query


# ---------------------------------------------------------------- parser
def test_parser_field_term_forms():
    sf = ("title",)
    pq = parse_query("title:merge^2 table", scored_fields=sf)
    c0, c1 = pq.positive
    assert (c0.kind, c0.tokens, c0.boost, c0.field) == (
        "term", ("f:title:merge",), 2.0, "title")
    assert (c1.tokens, c1.field) == (("table",), None)
    # negation scopes to the field
    pq = parse_query("-title:spam merge", scored_fields=sf)
    assert pq.negative[0].tokens == ("f:title:spam",)
    assert pq.negative[0].field == "title"
    # prefix expansion inside the field
    pq = parse_query("title:mer* table", scored_fields=sf)
    assert pq.positive[0].prefix and pq.positive[0].field == "title"
    # multi-token value ANDs per-token field clauses (bareword shape)
    pq = parse_query("title:foo-bar", scored_fields=sf)
    assert [c.tokens[0] for c in pq.positive] == [
        "f:title:foo", "f:title:-", "f:title:bar"]
    # unknown field keeps the historical bareword split
    pq = parse_query("title:merge", scored_fields=())
    assert all(c.field is None for c in pq.clauses)
    # attribute filters / ranges take precedence over scored fields
    pq = parse_query("lang:de n_chars:>5 title:x", scored_fields=sf)
    kinds = [c.kind for c in pq.positive]
    assert kinds == ["filter", "range", "term"]


def test_parser_field_term_rejects_fuzzy_regex():
    with pytest.raises(ValueError):
        parse_query("title:merge~1", scored_fields=("title",))
    with pytest.raises(ValueError):
        parse_query("title:/m.*/", scored_fields=("title",))
    with pytest.raises(ValueError):
        parse_query("-title:mer*", scored_fields=("title",))


def test_field_terms_skip_stem_and_compound_augmentation():
    from cuely_spark.queryengine.parser import compound_alternatives

    pq = parse_query("title:merge table window", scored_fields=("title",))
    alts = compound_alternatives(pq, 2)
    # no compound contains the field key, and the field clause itself
    # gets no alternatives
    assert 0 not in alts
    for v in alts.values():
        assert all("f:title" not in a for a in v)


# ------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def fdocs_pdf():
    rng = np.random.default_rng(23)
    vocab = ["merge", "table", "window", "scan", "sort", "key", "dup"]
    heads = ["alpha", "beta", "gamma", "merge"]
    rows = []
    for i in range(400):
        n = int(rng.integers(3, 12))
        text = " ".join(rng.choice(vocab, n))
        # short second field with its own vocabulary overlap: the head
        # tag plus the first body token — gives genuinely different
        # per-field dfs and fieldnorms
        title = heads[i % 4] + " " + text.split()[0]
        rows.append((i, text, title, ["en", "de"][i % 2]))
    return pd.DataFrame(rows, columns=["doc_id", "text", "title", "lang"])


@pytest.fixture(scope="module")
def freader(spark, fdocs_pdf, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    out = str(tmp_path_factory.mktemp("idx_fields"))
    build_index(spark, spark.createDataFrame(fdocs_pdf), out,
                doc_id_col="doc_id", rows_per_segment=100,
                attr_cols=("lang",), field_cols=("title",),
                fuzzy_sidecar=False)
    return IndexReader(spark, out)


@pytest.fixture(scope="module")
def fcon(fdocs_pdf):
    c = duckdb.connect()
    c.register("documents", fdocs_pdf)
    return c


def _spark_rows(df):
    return [(r["doc_id"], round(r["score"], 4)) for r in df.collect()]


FIELD_QUERIES = [
    "title:alpha",
    "title:merge",            # different df in title vs body
    "title:alpha merge",
    "title:merge^2 table",
    "title:alpha^0.5 title:merge",
    "merge -title:beta",
    "merge table -title:alpha",
    "title:gamma lang:de",
    'title:alpha "merge table"',
]


def test_field_terms_match_duckdb_oracle(freader, fcon):
    from cuely_spark.oracle_sql import bm25_search_sql

    for q in FIELD_QUERIES:
        got = _spark_rows(freader.search(q, k=freader.num_docs,
                                         dtype=np.float64))
        want = fcon.execute(bm25_search_sql(
            q, k=None, field_exprs={"title": "title"})).fetchall()
        assert sorted(d for d, _ in got) == sorted(
            d for d, _ in want), q
        gs = dict(got)
        for d, s in want:
            np.testing.assert_allclose(gs[d], s, atol=2e-4, err_msg=q)


def test_field_term_uses_field_statistics(freader, fdocs_pdf):
    """`title:merge` must rank by the TITLE's df/avg-fieldnorm — a doc
    whose title lacks 'merge' must not match even when its body has it,
    and vice versa."""
    got = dict(_spark_rows(freader.search("title:merge",
                                          k=freader.num_docs)))
    want = {int(r.doc_id) for _, r in fdocs_pdf.iterrows()
            if "merge" in r.title.split()}
    assert set(got) == want
    body_only = dict(_spark_rows(freader.search("merge",
                                                k=freader.num_docs)))
    assert set(body_only) == {
        int(r.doc_id) for _, r in fdocs_pdf.iterrows()
        if "merge" in r.text.split()}
    # different statistics -> different scores for the same token
    both = set(got) & set(body_only)
    assert both and any(abs(got[d] - body_only[d]) > 1e-3 for d in both)


def test_field_term_paths_parity(freader):
    """search / search_local / search_many / count / explain agree."""
    q = "title:alpha merge"
    res = freader.search(q, k=50, dtype=np.float64).toPandas()
    d1, s1 = freader.search_local(q, k=50, dtype=np.float64)
    assert res.doc_id.tolist() == d1.tolist()
    np.testing.assert_allclose(res.score.values, s1, rtol=1e-9)
    many = freader.search_many({"a": q}, k=50,
                               dtype=np.float64).toPandas()
    assert many[many["query"] == "a"].doc_id.tolist() == d1.tolist()
    assert freader.count(q) == freader.search(
        q, k=freader.num_docs).count()
    exp = freader.explain(q, int(d1[0]))
    np.testing.assert_allclose(exp.value, float(s1[0]), rtol=1e-6)
    # explain leaf shows the field term
    assert any("f:title:alpha" in ctx for lf in exp.leaves()
               for ctx in (lf.context or []))


def test_field_prefix_expansion(freader, fdocs_pdf):
    """`title:alp*` expands within the field's keyed dictionary (the
    sorted term-stats range prune works on 'f:title:alp' unchanged)."""
    got = dict(_spark_rows(freader.search("title:alp* merge",
                                          k=freader.num_docs)))
    want = {int(r.doc_id) for _, r in fdocs_pdf.iterrows()
            if any(t.startswith("alp") for t in r.title.split())
            and "merge" in r.text.split()}
    assert set(got) == want and got


def test_field_term_dead_and_errors(freader):
    # absent from the field vocabulary -> empty result
    assert freader.search("title:zzzq merge", k=10).count() == 0
    # unknown field on a ParsedQuery bypassing _parse -> loud error
    pq = parse_query("nosuch:merge", scored_fields=("nosuch",))
    with pytest.raises(ValueError, match="unknown scored field"):
        freader.search(pq, k=10)
    with pytest.raises(ValueError, match="unknown scored field"):
        freader.search_local(pq, k=10)
    # bm25f path rejects field scoping
    with pytest.raises(ValueError, match="field-scoped"):
        freader.search_bm25f("title:merge table", k=10)
    with pytest.raises(ValueError, match="field-scoped|simple positive"):
        freader.search_many(
            {"a": {"q": "title:merge", "bm25f": True}}, k=10)


# ------------------------------------------------------ field phrases
def test_parser_field_phrase_forms():
    sf = ("title",)
    pq = parse_query('title:"alpha merge"~2^1.5 table', scored_fields=sf)
    c0, c1 = pq.positive
    assert (c0.kind, c0.tokens, c0.slop, c0.boost, c0.field) == (
        "phrase", ("f:title:alpha", "f:title:merge"), 2, 1.5, "title")
    assert c1.tokens == ("table",)
    # single-token field phrase collapses to a field term
    pq = parse_query('title:"alpha"', scored_fields=sf)
    assert pq.positive[0].kind == "term"
    assert pq.positive[0].tokens == ("f:title:alpha",)
    # unknown field: the raw keeps the historical bareword/quote split
    pq = parse_query('nosuch:"alpha merge"', scored_fields=sf)
    assert all(c.field is None for c in pq.clauses)


FIELD_PHRASE_QUERIES = [
    'title:"alpha merge"',
    'title:"alpha merge" table',
    'title:"alpha merge"^2 -window',
    'title:"gamma sort"~2',
]


def test_field_phrases_match_duckdb_oracle(freader, fcon):
    from cuely_spark.oracle_sql import bm25_search_sql

    for q in FIELD_PHRASE_QUERIES:
        got = _spark_rows(freader.search(q, k=freader.num_docs,
                                         dtype=np.float64))
        want = fcon.execute(bm25_search_sql(
            q, k=None, field_exprs={"title": "title"})).fetchall()
        assert sorted(d for d, _ in got) == sorted(
            d for d, _ in want), q
        gs = dict(got)
        for d, s in want:
            np.testing.assert_allclose(gs[d], s, atol=2e-4, err_msg=q)


@pytest.fixture(scope="module")
def title_only_reader(spark, fdocs_pdf, tmp_path_factory):
    """Single-field index over the TITLE text: per-field statistics of
    the multi-field index must equal this index's primary statistics,
    so `title:X` there scores exactly like `X` here."""
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    out = str(tmp_path_factory.mktemp("idx_title_only"))
    pdf = fdocs_pdf[["doc_id", "title"]].rename(columns={"title": "text"})
    build_index(spark, spark.createDataFrame(pdf), out,
                doc_id_col="doc_id", rows_per_segment=100,
                fuzzy_sidecar=False)
    return IndexReader(spark, out)


def test_field_scoping_equals_single_field_index(freader,
                                                 title_only_reader):
    """The strongest invariant: a field-scoped query on the multi-field
    index is score-identical to the plain query on an index of just
    that field (same dfs, same fieldnorms, same N)."""
    pairs = [("title:alpha", "alpha"),
             ("title:merge^2", "merge^2"),
             ('title:"alpha merge"', '"alpha merge"'),
             ('title:"gamma sort"~2', '"gamma sort"~2'),
             ("title:alp*", "alp*")]
    for fq, pq in pairs:
        df, sf_ = freader.search_local(fq, k=freader.num_docs,
                                       dtype=np.float64)
        dp, sp = title_only_reader.search_local(
            pq, k=title_only_reader.num_docs, dtype=np.float64)
        assert df.tolist() == dp.tolist(), (fq, pq)
        np.testing.assert_allclose(sf_, sp, rtol=1e-12, err_msg=fq)


def test_field_phrase_paths_parity(freader):
    q = 'title:"alpha merge" table'
    res = freader.search(q, k=50, dtype=np.float64).toPandas()
    d1, s1 = freader.search_local(q, k=50, dtype=np.float64)
    assert res.doc_id.tolist() == d1.tolist()
    np.testing.assert_allclose(res.score.values, s1, rtol=1e-9)
    assert freader.count(q) == d1.size or freader.count(q) >= d1.size
    exp = freader.explain(q, int(d1[0]))
    np.testing.assert_allclose(exp.value, float(s1[0]), rtol=1e-6)


def test_field_terms_across_surfaces(freader):
    """Field queries work through every remaining query surface:
    one-pass hits+count, diversity collector, signals, optics,
    hybrid/approx counts — all treat the keys opaquely."""
    from cuely_spark.queryengine.optic import Rule

    q = "title:alpha merge"
    exact = freader.count(q)
    d, s, n = freader.search_with_count(q, k=10)
    assert int(n) == exact and n.exact
    dd, ss = freader.search_diverse(q, k=10, penalties={"lang": 0.1},
                                    de_rank_similar=False)
    assert dd.size == min(10, exact)
    hyb, hexact = freader.approx_count_hybrid(q)
    assert (hyb, hexact) == (exact, True)
    res = freader.search(q, k=10,
                         optic=[Rule("window", "boost", 0.5)])
    assert res.count() == min(10, exact)
    sig = freader.signals("title:alpha")
    assert sig.count() > 0


def test_build_rejects_reserved_field_names(spark, fdocs_pdf,
                                            tmp_path_factory):
    """A scored field named like an attribute/range query field would
    be unreachable (filter/range parsing wins) — build fails loudly."""
    from cuely_spark.indexer import build_index

    out = str(tmp_path_factory.mktemp("idx_clash"))
    bad = fdocs_pdf.assign(source=fdocs_pdf["title"])
    with pytest.raises(ValueError, match="reserved"):
        build_index(spark, spark.createDataFrame(bad), out,
                    doc_id_col="doc_id", rows_per_segment=100,
                    field_cols=("source",), fuzzy_sidecar=False)
