"""DuckDB oracle-SQL generators mirroring the engine's semantics.

Used by ``__spark_entry__.oracle_sql()`` — the driver runs these against
the same parquet tables and compares row sets with the Spark results.
The BM25 SQL reimplements, in SQL: the tokenizer (regex equivalent of
the reference Default tokenizer — exact for ASCII corpora), fieldnorm
quantization (256-entry table inlined), idf = ln(1 + (N-df+0.5)/(df+0.5)),
tf_factor with k1=1.2/b=0.75, phrase adjacency via positional self-joins,
and conjunctive AND with MustNot exclusion. Scores are float64 on both
sides, rounded to 4 decimals (Spark F.round and DuckDB round both do
half-up for positive values; numpy's banker rounding is avoided).
"""

from __future__ import annotations

from .fieldnorm import FIELD_NORMS_TABLE
from .queryengine.parser import (
    ParsedQuery,
    compound_alternatives,
    parse_query,
)

TOKEN_RE = "[a-z0-9]+|[^a-z0-9[:space:]]"
_FNT = ",".join(str(int(v)) for v in FIELD_NORMS_TABLE)


def _q(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def base_ctes(table: str = "documents", text_col: str = "text",
              id_col: str = "doc_id") -> str:
    """Shared CTEs: tokenization, doc lengths, quantized fieldnorms,
    global stats, positional token stream."""
    return f"""fnt(val) AS (SELECT unnest([{_FNT}])),
docs AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS toks
  FROM {table}
),
dl AS (SELECT doc_id, len(toks) AS doclen FROM docs),
dlq AS (
  SELECT d.doc_id, d.doclen,
         (SELECT max(val) FROM fnt WHERE val <= d.doclen) AS fnq
  FROM dl d
),
stats AS (
  SELECT count(*)::DOUBLE AS n,
         (sum(doclen)::DOUBLE / count(*)::DOUBLE) AS avgfn
  FROM dl
),
tok AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM docs
)"""


def _idf(term: str) -> str:
    return (f"(SELECT ln(1 + (s2.n - d.df + 0.5) / (d.df + 0.5)) "
            f"FROM dfs d, stats s2 WHERE d.term = {_q(term)})")


def _phrase_cte(name: str, tokens: tuple[str, ...], slop: int = 0,
                stream: str = "tok") -> str:
    if slop > 0:
        return _phrase_slop_ctes(name, tokens, slop, stream=stream)
    joins = [f"(SELECT doc_id, pos FROM {stream} "
             f"WHERE term={_q(tokens[0])}) w0"]
    for i, t in enumerate(tokens[1:], start=1):
        joins.append(
            f"JOIN (SELECT doc_id, pos FROM {stream} "
            f"WHERE term={_q(t)}) w{i} "
            f"ON w{i}.doc_id = w0.doc_id AND w{i}.pos = w0.pos + {i}")
    return (f"{name} AS (SELECT w0.doc_id, count(*)::DOUBLE AS tf "
            f"FROM {' '.join(joins)} GROUP BY w0.doc_id)")


def _phrase_prefix_ctes(name: str, tokens: tuple[str, ...]) -> str:
    """Phrase-prefix tf CTEs (tantivy PhrasePrefixQuery): exact
    positional chain over the fixed words, the final position matched
    by ANY dictionary term starting with tokens[-1] (df desc, term asc,
    cap 50 — mirrors IndexReader.prefix_terms). Requires the dfs_all
    vocabulary CTE."""
    n = len(tokens)
    fz = f"{name}_fz"
    joins = [f"(SELECT doc_id, pos FROM tok WHERE term={_q(tokens[0])}) w0"]
    for i, t in enumerate(tokens[1:-1], start=1):
        joins.append(
            f"JOIN (SELECT doc_id, pos FROM tok WHERE term={_q(t)}) w{i} "
            f"ON w{i}.doc_id = w0.doc_id AND w{i}.pos = w0.pos + {i}")
    joins.append(
        f"JOIN (SELECT t.doc_id, t.pos FROM tok t JOIN {fz} z "
        f"USING (term)) w{n - 1} "
        f"ON w{n - 1}.doc_id = w0.doc_id "
        f"AND w{n - 1}.pos = w0.pos + {n - 1}")
    return (f"{fz} AS (\n"
            f"  SELECT term, df FROM dfs_all "
            f"WHERE starts_with(term, {_q(tokens[-1])})\n"
            f"  ORDER BY df DESC, term LIMIT 50\n"
            f"),\n"
            f"{name} AS (SELECT w0.doc_id, count(*)::DOUBLE AS tf "
            f"FROM {' '.join(joins)} GROUP BY w0.doc_id)")


def _phrase_slop_ctes(name: str, tokens: tuple[str, ...],
                      slop: int, stream: str = "tok") -> str:
    """Near-phrase tf CTEs mirroring the engine's budgeted-chain DP
    (kernel._phrase_tf_slop): adjusted positions a_i = pos + (n-1-i);
    chain CTE c{i} holds, per (doc, a_i), the minimal accumulated
    |Δa| over chains p_1..p_i; tf = count of distinct last-word
    positions whose minimal chain cost <= slop. Emitted as sibling
    CTEs {name}_c0.. + the final {name}(doc_id, tf)."""
    n = len(tokens)
    parts = [f"{name}_c0 AS (SELECT doc_id, pos + {n - 1} AS a, "
             f"0 AS s FROM {stream} WHERE term={_q(tokens[0])})"]
    for i, t in enumerate(tokens[1:], start=1):
        prev = f"{name}_c{i - 1}"
        parts.append(
            f"{name}_c{i} AS (SELECT w.doc_id, w.a, "
            f"min(p.s + abs(w.a - p.a)) AS s "
            f"FROM (SELECT doc_id, pos + {n - 1 - i} AS a "
            f"FROM {stream} WHERE term={_q(t)}) w "
            f"JOIN {prev} p ON p.doc_id = w.doc_id "
            f"AND p.s + abs(w.a - p.a) <= {slop} "
            f"GROUP BY w.doc_id, w.a)")
    parts.append(f"{name} AS (SELECT doc_id, count(*)::DOUBLE AS tf "
                 f"FROM {name}_c{n - 1} GROUP BY doc_id)")
    return ",\n".join(parts)


def _tf_factor(tf_expr: str) -> str:
    return (f"({tf_expr} * 2.2) / ({tf_expr} + 1.2 * "
            f"(1 - 0.75 + 0.75 * cand.fnq / s.avgfn))")


def _filter_cond(token: str, table: str, id_col: str,
                 doc_expr: str) -> str:
    """SQL for an attribute-filter term like 'lang:de' against the
    source table's column (values matched lowercase, as indexed)."""
    field, _, value = token.partition(":")
    return (f"EXISTS (SELECT 1 FROM {table} t_{field} "
            f"WHERE t_{field}.{id_col} = {doc_expr} "
            f"AND lower(CAST(t_{field}.{field} AS VARCHAR)) = {_q(value)})")


def _range_cond(c, table: str, id_col: str, doc_expr: str) -> str:
    """SQL for an unscored range-filter clause (n_chars:100..200,
    ts:>=2025-01-01) against the source table's column — mirrors the
    engine's partition-pruned row-store range filter."""
    col = c.tokens[0]

    def lit(v: str) -> str:
        if col == "ts":
            return "TIMESTAMP '" + v.replace("T", " ") + "'"
        return v

    conds = []
    if c.lo is not None:
        conds.append(f"r_{col}.{col} {'>=' if c.lo_inc else '>'} "
                     f"{lit(c.lo)}")
    if c.hi is not None:
        conds.append(f"r_{col}.{col} {'<=' if c.hi_inc else '<'} "
                     f"{lit(c.hi)}")
    return (f"EXISTS (SELECT 1 FROM {table} r_{col} "
            f"WHERE r_{col}.{id_col} = {doc_expr} "
            f"AND {' AND '.join(conds)})")


def _exists_cond(c, table: str, id_col: str, doc_expr: str,
                 attr_exprs: dict[str, str] | None = None) -> str:
    """SQL for an ExistsQuery clause (`field:*` / `-field:*`): the
    attribute column (or a caller-provided derivation expression, for
    indexes whose attr column is computed from the source table) is
    non-null AND non-empty; `neg` inverts."""
    col = c.tokens[0]
    # each EXISTS has its own scope, so a fixed alias `ex` is safe;
    # attr_exprs values reference source columns as `ex.<col>`
    expr = (attr_exprs or {}).get(col, f"ex.{col}")
    cond = (f"{expr} IS NOT NULL AND "
            f"CAST({expr} AS VARCHAR) <> ''")
    if c.neg:
        cond = f"NOT ({cond})"
    return (f"EXISTS (SELECT 1 FROM {table} ex "
            f"WHERE ex.{id_col} = {doc_expr} AND {cond})")


def _ngram_tok_cte(ngram_max: int) -> str:
    """`ntok`: text tokens plus 'b:'/'t:' compound shadow tokens (lead()
    windows over the positional stream, never crossing docs)."""
    parts = ["SELECT doc_id, term FROM tok"]
    if ngram_max >= 2:
        parts.append("""SELECT doc_id, 'b:' || term || t1 AS term FROM (
    SELECT doc_id, term,
           lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
    FROM tok) WHERE t1 IS NOT NULL""")
        # short docs (< 2 tokens) emit one all-token concat (ngram.rs)
        parts.append("""SELECT doc_id, 'b:' || array_to_string(toks, '') AS term
  FROM docs WHERE len(toks) = 1""")
    if ngram_max >= 3:
        parts.append("""SELECT doc_id, 't:' || term || t1 || t2 AS term FROM (
    SELECT doc_id, term, lead(term, 1) OVER w AS t1,
           lead(term, 2) OVER w AS t2
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
  WHERE t2 IS NOT NULL""")
        parts.append("""SELECT doc_id, 't:' || array_to_string(toks, '') AS term
  FROM docs WHERE len(toks) BETWEEN 1 AND 2""")
    return "ntok AS (\n  " + "\n  UNION ALL\n  ".join(parts) + "\n)"


def bm25_search_sql(query: str, k: int | None = 20,
                    table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id", occur: str = "must",
                    should: str | None = None, offset: int = 0,
                    ngram_max: int = 0,
                    round_to: int | None = 4,
                    tie: float | None = None,
                    const_score: float | None = None,
                    attr_exprs: dict[str, str] | None = None,
                    field_exprs: dict[str, str] | None = None) -> str:
    """BM25 search SQL: (doc_id, score) — score desc, doc_id asc.
    k=None returns ALL matching docs (no LIMIT).
    occur="should" scores the disjunction (term clauses only).
    occur="dismax" scores it with the DisjunctionMax combiner:
    max matching clause + `tie` × (sum − max).
    const_score: fixed score for every matching doc (ConstScoreQuery).
    attr_exprs: for exists clauses (`field:*`) over DERIVED attribute
    columns — maps column name to a SQL expression over the source
    table (alias the source as `ex`, e.g. "CASE WHEN ex.doc_id % 3 =
    0 THEN '' ELSE 'bash' END").
    field_exprs: extra scored fields — maps field name to a SQL text
    expression over the source table; `name:value` query tokens over
    these names become field-scoped term clauses scored with THAT
    field's df and avg fieldnorm (mirrors IndexReader.search on a
    field_cols index; plain terms still score the primary field only).
    Clause `^N` boosts are applied as (idf × boost) × tf_factor —
    the same association as the engine's Bm25Weight.boost_by.
    should: extra Should clauses — LEFT JOIN + COALESCE score terms on
    the Must candidate set (never gate membership).
    offset: SQL OFFSET (pagination).
    ngram_max: replicate compound-term augmentation — each simple term
    clause becomes (term OR compounds), membership by any member, score
    = sum of matching members (mirrors IndexReader.search compound_terms
    against an ngram_max index)."""
    if occur in ("should", "dismax"):
        assert should is None and offset == 0
        return _bm25_should_sql(query, k, table, text_col, id_col,
                                tie=(tie if occur == "dismax" else None))
    pq: ParsedQuery = parse_query(
        query, scored_fields=tuple(field_exprs or ()))
    compounds = compound_alternatives(pq, ngram_max)
    pos_idx = [i for i, c in enumerate(pq.clauses) if c.kind != "not"]
    c_terms = [t for alts in compounds.values() for t in alts]
    spq = parse_query(should) if should is not None else None
    s_terms = spq.all_terms() if spq is not None else []
    all_terms = sorted(set(pq.all_terms()) | set(s_terms) | set(c_terms))
    terms_in = ", ".join(_q(t) for t in all_terms)
    stream = "ntok" if compounds else "tok"

    ctes = [base_ctes(table, text_col, id_col)]
    if compounds:
        ctes.append(_ngram_tok_cte(ngram_max))
    ctes.append(f"""tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM {stream} WHERE term IN ({terms_in}) GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM {stream} WHERE term IN ({terms_in}) GROUP BY term
)""")

    # ---- field-scoped terms: one token/tf/df CTE set per used field,
    # scored with THAT field's df and avg fieldnorm (mirrors
    # IndexReader._weights over "f:{field}:{token}" keys)
    fidx = {f: i for i, f in enumerate(
        sorted({c.field for c in pq.clauses if c.field}))}
    if fidx:
        fbare: dict[str, set[str]] = {f: set() for f in fidx}
        for c in pq.clauses:
            if c.field:
                if c.prefix or c.fuzzy or c.regex:
                    raise NotImplementedError(
                        "oracle SQL models plain field-scoped terms/"
                        "phrases only (no field prefix/fuzzy/regex)")
                fbare[c.field].update(
                    t.split(":", 2)[2] for t in c.tokens)
        for f, i in fidx.items():
            fin = ", ".join(_q(t) for t in sorted(fbare[f]))
            ctes.append(f"""xfd{i} AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower(COALESCE({field_exprs[f]}, '')),
                            '{TOKEN_RE}') AS toks
  FROM {table}
),
xfq{i} AS (
  SELECT doc_id,
         (SELECT max(val) FROM fnt WHERE val <= len(toks)) AS fnq
  FROM xfd{i}
),
xav{i} AS (SELECT sum(len(toks))::DOUBLE / count(*)::DOUBLE AS a
           FROM xfd{i}),
xtok{i} AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM xfd{i}
),
xtf{i} AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM xfd{i})
  WHERE term IN ({fin}) GROUP BY doc_id, term
),
xdf{i} AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM (SELECT doc_id, unnest(toks) AS term FROM xfd{i})
  WHERE term IN ({fin}) GROUP BY term
)""")

    def _expansion_cond(c) -> str | None:
        """Dictionary-match condition for fuzzy/prefix/regex clauses —
        mirrors IndexReader.{fuzzy,prefix,regex}_terms."""
        if c.kind != "term":
            return None
        if c.fuzzy:
            return f"levenshtein(term, {_q(c.tokens[0])}) <= {c.fuzzy}"
        if c.prefix:
            return f"starts_with(term, {_q(c.tokens[0])})"
        if c.regex:
            return f"regexp_full_match(term, {_q(c.tokens[0])})"
        return None

    if any(_expansion_cond(c) for c in pq.positive) or any(
            c.kind == "phrase" and c.prefix for c in pq.positive):
        # expansion clauses need the FULL vocabulary (the member set is
        # computed in SQL, not enumerated)
        ctes.append("""tf_all AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
  GROUP BY doc_id, term
),
dfs_all AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
  GROUP BY term
)""")

    joins = ["CROSS JOIN stats s"]
    for _f, _i in fidx.items():
        joins.append(f"JOIN xfq{_i} fq{_i} "
                     f"ON fq{_i}.doc_id = cand.doc_id")
    score_terms = []
    exists_conds = []
    def _bidf(idf_expr: str, boost: float) -> str:
        """(idf × boost) — the engine's Bm25Weight.boost_by applies the
        `^N` boost to the weight, so score and bounds scale together."""
        return (idf_expr if boost == 1.0
                else f"({idf_expr} * {boost!r})")

    for ci, c in enumerate(pq.positive):
        alts = compounds.get(pos_idx[ci], []) if c.kind == "term" else []
        if c.kind in ("termset", "all"):
            # flat 1.0 × boost: TermSetQuery's combiner ignores member
            # scores (tantivy set_query.rs), AllQuery scores 1.0
            score_terms.append(repr(float(c.boost)))
            continue
        if c.kind == "exists":
            continue  # unscored; condition added below
        if c.kind == "term" and c.field:
            i = fidx[c.field]
            bare = c.tokens[0].split(":", 2)[2]
            a = f"x{ci}"
            joins.append(
                f"JOIN xtf{i} {a} ON {a}.doc_id = cand.doc_id "
                f"AND {a}.term = {_q(bare)}")
            idf_f = (f"(SELECT ln(1 + (s2.n - z.df + 0.5) / "
                     f"(z.df + 0.5)) FROM xdf{i} z, stats s2 "
                     f"WHERE z.term = {_q(bare)})")
            score_terms.append(
                f"{_bidf(idf_f, c.boost)} * "
                f"({a}.tf * 2.2) / ({a}.tf + 1.2 * (1 - 0.75 + "
                f"0.75 * fq{i}.fnq / (SELECT a FROM xav{i})))")
            continue
        if (fcond := _expansion_cond(c)) is not None:
            if alts:
                raise NotImplementedError(
                    "oracle SQL does not model an expansion clause "
                    "combined with ngram/stem alternatives — gate "
                    "expansion queries on a plain index")
            # expansion or-group (fuzzy/prefix/regex): members =
            # dictionary terms matching the condition, (df desc, term
            # asc) capped at 50 — mirrors the IndexReader expansion;
            # score = sum of matching members' BM25 contributions
            ctes.append(f"""fz{ci} AS (
  SELECT term, df FROM dfs_all
  WHERE {fcond}
  ORDER BY df DESC, term LIMIT 50
),
fs{ci} AS (
  SELECT t.doc_id,
         sum({_bidf('ln(1 + (s.n - z.df + 0.5) / (z.df + 0.5))',
                    c.boost)}
             * (t.tf * 2.2) / (t.tf + 1.2 *
                (1 - 0.75 + 0.75 * q.fnq / s.avgfn))) AS sc
  FROM tf_all t JOIN fz{ci} z USING (term)
  JOIN dlq q ON q.doc_id = t.doc_id CROSS JOIN stats s
  GROUP BY t.doc_id
)""")
            joins.append(f"LEFT JOIN fs{ci} "
                         f"ON fs{ci}.doc_id = cand.doc_id")
            score_terms.append(f"COALESCE(fs{ci}.sc, 0.0)")
        elif c.kind == "term" and alts:
            members = [c.tokens[0]] + alts
            member_scores = []
            for mi, m in enumerate(members):
                a = f"g{ci}_{mi}"
                joins.append(
                    f"LEFT JOIN tf {a} ON {a}.doc_id = cand.doc_id "
                    f"AND {a}.term = {_q(m)}")
                member_scores.append(
                    f"COALESCE({_bidf(_idf(m), c.boost)} * "
                    f"{_tf_factor(f'{a}.tf')}, 0.0)")
            score_terms.append("(" + " + ".join(member_scores) + ")")
        elif c.kind == "term":
            a = f"t{ci}"
            joins.append(
                f"JOIN tf {a} ON {a}.doc_id = cand.doc_id "
                f"AND {a}.term = {_q(c.tokens[0])}")
            score_terms.append(
                f"{_bidf(_idf(c.tokens[0]), c.boost)} * "
                f"{_tf_factor(f'{a}.tf')}")
        elif c.kind in ("filter", "range"):
            pass  # unscored; condition added below
        elif c.kind == "phrase" and c.field:
            i = fidx[c.field]
            bares = tuple(t.split(":", 2)[2] for t in c.tokens)
            name = f"ph{ci}"
            ctes.append(_phrase_cte(name, bares, c.slop,
                                    stream=f"xtok{i}"))

            def _fidf(t, i=i):
                return (f"(SELECT ln(1 + (s2.n - z.df + 0.5) / "
                        f"(z.df + 0.5)) FROM xdf{i} z, stats s2 "
                        f"WHERE z.term = {_q(t)})")

            idf_sum = " + ".join(_fidf(t) for t in bares)
            a = f"p{ci}"
            joins.append(f"JOIN {name} {a} ON {a}.doc_id = cand.doc_id")
            score_terms.append(
                f"{_bidf(f'({idf_sum})', c.boost)} * "
                f"({a}.tf * 2.2) / ({a}.tf + 1.2 * (1 - 0.75 + "
                f"0.75 * fq{i}.fnq / (SELECT a FROM xav{i})))")
        else:
            name = f"ph{ci}"
            if c.prefix:
                ctes.append(_phrase_prefix_ctes(name, c.tokens))
                # tantivy weights a phrase-prefix by the FIXED terms
                idf_sum = " + ".join(_idf(t) for t in c.tokens[:-1])
            else:
                ctes.append(_phrase_cte(name, c.tokens, c.slop))
                idf_sum = " + ".join(_idf(t) for t in c.tokens)
            a = f"p{ci}"
            joins.append(f"JOIN {name} {a} ON {a}.doc_id = cand.doc_id")
            score_terms.append(
                f"{_bidf(f'({idf_sum})', c.boost)} * "
                f"{_tf_factor(f'{a}.tf')}")
    if spq is not None:
        for ci, c in enumerate(spq.positive):
            if c.kind == "filter":
                continue  # unscored should collapses into must: no-op
            a = f"s{ci}"
            if c.kind == "term":
                joins.append(
                    f"LEFT JOIN tf {a} ON {a}.doc_id = cand.doc_id "
                    f"AND {a}.term = {_q(c.tokens[0])}")
                score_terms.append(
                    f"COALESCE({_idf(c.tokens[0])} * "
                    f"{_tf_factor(f'{a}.tf')}, 0.0)")
            else:
                name = f"sph{ci}"
                ctes.append(_phrase_cte(name, c.tokens, c.slop))
                joins.append(f"LEFT JOIN {name} {a} "
                             f"ON {a}.doc_id = cand.doc_id")
                idf_sum = " + ".join(_idf(t) for t in c.tokens)
                score_terms.append(
                    f"COALESCE(({idf_sum}) * {_tf_factor(f'{a}.tf')}, "
                    f"0.0)")
    if not score_terms:
        score_terms = ["0.0"]  # filter-only query

    # candidate set: all positive clauses matched, no negative group fully
    for ci, c in enumerate(pq.positive):
        alts = compounds.get(pos_idx[ci], []) if c.kind == "term" else []
        if c.kind == "all":
            continue  # matches every doc — no condition
        if c.kind == "termset":
            any_m = " OR ".join(
                f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = cand.doc_id "
                f"AND tf.term = {_q(m)})" for m in c.tokens)
            exists_conds.append(f"({any_m})")
            continue
        if c.kind == "exists":
            exists_conds.append(_exists_cond(c, table, id_col,
                                             "cand.doc_id", attr_exprs))
            continue
        if _expansion_cond(c) is not None:
            exists_conds.append(
                f"EXISTS (SELECT 1 FROM fs{ci} "
                f"WHERE fs{ci}.doc_id = cand.doc_id)")
        elif c.kind == "term" and alts:
            any_m = " OR ".join(
                f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = cand.doc_id "
                f"AND tf.term = {_q(m)})"
                for m in [c.tokens[0]] + alts)
            exists_conds.append(f"({any_m})")
        elif c.kind == "term" and c.field:
            i = fidx[c.field]
            bare = c.tokens[0].split(":", 2)[2]
            exists_conds.append(
                f"EXISTS (SELECT 1 FROM xtf{i} WHERE "
                f"xtf{i}.doc_id = cand.doc_id "
                f"AND xtf{i}.term = {_q(bare)})")
        elif c.kind == "term":
            exists_conds.append(
                f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = cand.doc_id "
                f"AND tf.term = {_q(c.tokens[0])})")
        elif c.kind == "filter":
            exists_conds.append(_filter_cond(c.tokens[0], table, id_col,
                                             "cand.doc_id"))
        elif c.kind == "range":
            exists_conds.append(_range_cond(c, table, id_col,
                                            "cand.doc_id"))
        else:
            exists_conds.append(
                f"EXISTS (SELECT 1 FROM ph{ci} "
                f"WHERE ph{ci}.doc_id = cand.doc_id)")
    for c in pq.negative:
        if c.field:
            i = fidx[c.field]
            inner = " AND ".join(
                f"EXISTS (SELECT 1 FROM xtf{i} WHERE "
                f"xtf{i}.doc_id = cand.doc_id "
                f"AND xtf{i}.term = {_q(t.split(':', 2)[2])})"
                for t in c.tokens)
            exists_conds.append(f"NOT ({inner})")
            continue
        inner = " AND ".join(
            _filter_cond(t, table, id_col, "cand.doc_id")
            if ":" in t else
            f"EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = cand.doc_id "
            f"AND tok.term = {_q(t)})" for t in c.tokens)
        exists_conds.append(f"NOT ({inner})")

    raw_score = ' + '.join(score_terms)
    if const_score is not None:
        # ConstScoreQuery: membership above, score a constant
        raw_score = repr(float(const_score))
    score_expr = (f"round({raw_score}, {round_to})"
                  if round_to is not None else f"({raw_score})")
    if not exists_conds:
        exists_conds = ["TRUE"]  # `*`-only positives (match-all)
    sql = f"""WITH {', '.join(ctes)},
cand AS (
  SELECT cand.doc_id, cand.fnq FROM dlq cand
  WHERE {' AND '.join(exists_conds)}
)
SELECT cand.doc_id AS doc_id,
       {score_expr} AS score
FROM cand {' '.join(joins)}
ORDER BY score DESC, doc_id ASC"""
    if k is not None:
        sql += f"\nLIMIT {k}"
    if offset:
        sql += f"\nOFFSET {offset}"
    return sql


def _bm25_should_sql(query: str, k: int | None, table: str,
                     text_col: str, id_col: str,
                     tie: float | None = None) -> str:
    """Scored disjunction: docs matching ANY term clause; score = sum of
    matching contributions (LEFT JOIN + COALESCE per clause).
    tie: DisjunctionMax combiner (tantivy DisjunctionMaxQuery,
    score_combiner.rs:82-115) — score = max matching clause +
    tie × (sum − max). Contributions are non-negative, so greatest()
    over the COALESCE'd per-clause scores equals the max over matching
    clauses only."""
    pq = parse_query(query)
    assert all(c.kind == "term" for c in pq.positive)
    all_terms = sorted({c.tokens[0] for c in pq.positive}
                       | {t for c in pq.negative for t in c.tokens})
    terms_in = ", ".join(_q(t) for t in all_terms)
    ctes = [base_ctes(table, text_col, id_col)]
    ctes.append(f"""tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok WHERE term IN ({terms_in}) GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE term IN ({terms_in}) GROUP BY term
)""")
    joins = ["CROSS JOIN stats s"]
    score_terms = []
    any_conds = []
    for ci, c in enumerate(pq.positive):
        t = c.tokens[0]
        a = f"t{ci}"
        joins.append(
            f"LEFT JOIN tf {a} ON {a}.doc_id = cand.doc_id "
            f"AND {a}.term = {_q(t)}")
        idf = (_idf(t) if c.boost == 1.0
               else f"({_idf(t)} * {c.boost!r})")
        score_terms.append(
            f"COALESCE({idf} * {_tf_factor(f'{a}.tf')}, 0.0)")
        any_conds.append(
            f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = cand.doc_id "
            f"AND tf.term = {_q(t)})")
    neg_conds = []
    for c in pq.negative:
        inner = " AND ".join(
            f"EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = cand.doc_id "
            f"AND tok.term = {_q(t)})" for t in c.tokens)
        neg_conds.append(f"NOT ({inner})")
    where = f"({' OR '.join(any_conds)})"
    if neg_conds:
        where += " AND " + " AND ".join(neg_conds)
    sum_expr = ' + '.join(score_terms)
    if tie is not None and len(score_terms) > 1:
        gmax = f"greatest({', '.join(score_terms)})"
        raw = f"{gmax} + {tie!r} * (({sum_expr}) - {gmax})"
    else:
        raw = sum_expr
    sql = f"""WITH {', '.join(ctes)},
cand AS (
  SELECT cand.doc_id, cand.fnq FROM dlq cand
  WHERE {where}
)
SELECT cand.doc_id AS doc_id,
       round({raw}, 4) AS score
FROM cand {' '.join(joins)}
ORDER BY score DESC, doc_id ASC"""
    if k is not None:
        sql += f"\nLIMIT {k}"
    return sql


def bm25f_search_sql(query: str, fields: dict[str, str],
                     coeffs: dict[str, float] | None = None,
                     k: int | None = None, table: str = "documents",
                     id_col: str = "doc_id") -> str:
    """BM25F oracle (reference semantics, ranking/bm25f.rs:64-181):
    `fields` maps field name -> SQL text expression (primary first);
    membership = every query term in ANY field (AND across terms),
    score = sum over (term, field) of
    idf_union(term) * (tf*c_f * 2.2) / (tf*c_f + 1.2*(1 - 0.75 +
    0.75 * fieldnorm_f / avg_fieldnorm_f)) — IDF from the union-of-
    fields doc freq, per-field quantized fieldnorms, field coefficient
    inside the tf saturation."""
    pq: ParsedQuery = parse_query(query)
    coeffs = coeffs or {}
    fnames = list(fields)
    terms = sorted({t for c in pq.clauses for t in c.tokens
                    if ":" not in t})
    terms_in = ", ".join(_q(t) for t in terms)

    ctes = [f"fnt(val) AS (SELECT unnest([{_FNT}]))"]
    for i, (fname, expr) in enumerate(fields.items()):
        ctes.append(f"""fd{i} AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({expr}), '{TOKEN_RE}') AS toks
  FROM {table}
),
q{i} AS (
  SELECT doc_id,
         (SELECT max(val) FROM fnt WHERE val <= len(toks)) AS fnq
  FROM fd{i}
),
av{i} AS (SELECT sum(len(toks))::DOUBLE / count(*)::DOUBLE AS a
          FROM fd{i}),
tk{i} AS (SELECT doc_id, unnest(toks) AS term FROM fd{i}),
tf{i} AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tk{i} WHERE term IN ({terms_in}) GROUP BY doc_id, term
)""")
    union_all = " UNION ALL ".join(
        f"SELECT doc_id, term FROM tk{i}" for i in range(len(fnames)))
    ctes.append(f"""st AS (SELECT count(*)::DOUBLE AS n FROM fd0),
udfs AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM ({union_all}) u WHERE term IN ({terms_in}) GROUP BY term
)""")

    def idf_u(t: str) -> str:
        return (f"(SELECT ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) "
                f"FROM udfs d, st WHERE d.term = {_q(t)})")

    joins, score_terms, conds = [], [], []
    for ci, c in enumerate(pq.positive):
        t = c.tokens[0]
        if c.kind == "filter" or ":" in t:
            conds.append(_filter_cond(t, table, id_col, "cand.doc_id"))
            continue
        member_scores = []
        any_f = []
        for i, fname in enumerate(fnames):
            a = f"t{ci}_{i}"
            cf = float(coeffs.get(fname, 1.0))
            joins.append(
                f"LEFT JOIN tf{i} {a} ON {a}.doc_id = cand.doc_id "
                f"AND {a}.term = {_q(t)}")
            tfx = f"({a}.tf * {cf})"
            member_scores.append(
                f"COALESCE({idf_u(t)} * ({tfx} * 2.2) / ({tfx} + 1.2 * "
                f"(1 - 0.75 + 0.75 * cand.fnq{i} / "
                f"(SELECT a FROM av{i}))), 0.0)")
            any_f.append(
                f"EXISTS (SELECT 1 FROM tf{i} WHERE "
                f"tf{i}.doc_id = cand.doc_id AND tf{i}.term = {_q(t)})")
        score_terms.append("(" + " + ".join(member_scores) + ")")
        conds.append("(" + " OR ".join(any_f) + ")")
    for c in pq.negative:
        tok_conds = []
        for t in c.tokens:
            if ":" in t:
                tok_conds.append(
                    _filter_cond(t, table, id_col, "cand.doc_id"))
            else:
                tok_conds.append("(" + " OR ".join(
                    f"EXISTS (SELECT 1 FROM tk{i} WHERE "
                    f"tk{i}.doc_id = cand.doc_id "
                    f"AND tk{i}.term = {_q(t)})"
                    for i in range(len(fnames))) + ")")
        conds.append(f"NOT ({' AND '.join(tok_conds)})")
    if not score_terms:
        score_terms = ["0.0"]

    fnq_cols = ", ".join(
        f"q{i}.fnq AS fnq{i}" for i in range(len(fnames)))
    fnq_joins = " ".join(
        f"JOIN q{i} ON q{i}.doc_id = base.doc_id"
        for i in range(len(fnames)))
    sql = f"""WITH {', '.join(ctes)},
cand AS (
  SELECT base.doc_id, {fnq_cols}
  FROM (SELECT doc_id FROM fd0) base {fnq_joins}
)
SELECT cand.doc_id AS doc_id,
       round({' + '.join(score_terms)}, 4) AS score
FROM cand {' '.join(joins)}
WHERE {' AND '.join(conds) if conds else 'TRUE'}
ORDER BY score DESC, doc_id ASC"""
    if k is not None:
        sql += f"\nLIMIT {k}"
    return sql


def facet_sql(query: str, by, k: int = 50,
              table: str = "documents", text_col: str = "text",
              id_col: str = "doc_id",
              field_exprs: dict[str, str] | None = None) -> str:
    """Facet/terms-aggregation oracle: (col, value, count) — for each
    `by` column, the top-k attribute values among docs matching
    `query` (count desc, value asc per column; NULLs dropped) —
    mirrors IndexReader.facet_counts."""
    cols = [by] if isinstance(by, str) else list(by)
    m = _membership_sql(query, table, text_col, id_col, field_exprs)
    parts = [f"""SELECT '{c}' AS col, CAST(d.{c} AS VARCHAR) AS value,
       count(*) AS "count"
FROM ({m}) m JOIN {table} d ON d.{id_col} = m.doc_id
WHERE d.{c} IS NOT NULL
GROUP BY 1, 2""" for c in cols]
    u = " UNION ALL ".join(f"({p})" for p in parts)
    return f"""SELECT col, value, "count" FROM (
  SELECT *, row_number() OVER (
    PARTITION BY col ORDER BY "count" DESC, value ASC) AS __r
  FROM ({u})
) WHERE __r <= {k}
ORDER BY col, "count" DESC, value ASC"""


def stats_agg_sql(query: str, by, table: str = "documents",
                  text_col: str = "text", id_col: str = "doc_id",
                  field_exprs: dict[str, str] | None = None) -> str:
    """Metric (extended) stats oracle: (col, count, sum, avg, min,
    max, variance, stddev) per `by` column over docs matching
    `query` — mirrors IndexReader.agg_stats (avg = sum::DOUBLE /
    count, population variance = sumsq/n - mean^2, so both engines
    perform the identical arithmetic)."""
    cols = [by] if isinstance(by, str) else list(by)
    m = _membership_sql(query, table, text_col, id_col, field_exprs)
    parts = []
    for c in cols:
        mean = f"(CAST(sum(d.{c}) AS DOUBLE) / count(*))"
        var = (f"(CAST(sum(CAST(d.{c} AS DOUBLE) "
               f"* CAST(d.{c} AS DOUBLE)) AS DOUBLE) / count(*) "
               f"- {mean} * {mean})")
        parts.append(f"""SELECT '{c}' AS col, count(*) AS "count",
       CAST(sum(d.{c}) AS DOUBLE) AS sum,
       {mean} AS avg,
       CAST(min(d.{c}) AS DOUBLE) AS min,
       CAST(max(d.{c}) AS DOUBLE) AS max,
       {var} AS variance,
       sqrt({var}) AS stddev
FROM ({m}) m JOIN {table} d ON d.{id_col} = m.doc_id
WHERE d.{c} IS NOT NULL""")
    return " UNION ALL ".join(f"({p})" for p in parts)


def histogram_sql(query: str, col: str, interval: float,
                  table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id",
                  field_exprs: dict[str, str] | None = None,
                  ts: bool = False) -> str:
    """Histogram-aggregation oracle: (bucket, count) with bucket =
    floor(value / interval) * interval — mirrors
    IndexReader.histogram (empty buckets not filled, NULLs dropped).
    ts=True keys a timestamp column by epoch seconds (the
    date_histogram form)."""
    m = _membership_sql(query, table, text_col, id_col, field_exprs)
    v = (f"epoch(d.{col})" if ts
         else f"CAST(d.{col} AS DOUBLE)")
    return f"""SELECT floor({v} / {interval!r})
         * {interval!r} AS bucket,
       count(*) AS "count"
FROM ({m}) m JOIN {table} d ON d.{id_col} = m.doc_id
WHERE d.{col} IS NOT NULL
GROUP BY 1 ORDER BY 1"""


def range_agg_sql(query: str, col: str, edges: list[float],
                  table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id",
                  field_exprs: dict[str, str] | None = None,
                  ts: bool = False) -> str:
    """Range-bucket oracle: (lo, hi, count) per half-open bucket
    (-inf, e0), [e0, e1), ..., [eN-1, inf) — zero-count buckets
    included — mirrors IndexReader.range_buckets. ts=True compares a
    timestamp column by epoch seconds."""
    edges = [float(e) for e in edges]
    m = _membership_sql(query, table, text_col, id_col, field_exprs)
    v = f"epoch(d.{col})" if ts else f"CAST(d.{col} AS DOUBLE)"
    bounds = ([(None, edges[0])] + list(zip(edges[:-1], edges[1:]))
              + [(edges[-1], None)])
    parts = []
    for lo, hi in bounds:
        conds = [f"d.{col} IS NOT NULL"]
        if lo is not None:
            conds.append(f"{v} >= {lo!r}")
        if hi is not None:
            conds.append(f"{v} < {hi!r}")
        lo_s = "NULL::DOUBLE" if lo is None else repr(lo)
        hi_s = "NULL::DOUBLE" if hi is None else repr(hi)
        parts.append(
            f"""SELECT {lo_s} AS lo, {hi_s} AS hi, count(*) AS "count"
FROM ({m}) m JOIN {table} d ON d.{id_col} = m.doc_id
WHERE {' AND '.join(conds)}""")
    return " UNION ALL ".join(f"({p})" for p in parts)


def facet_stats_sql(query: str, by: str, metric: str, k: int = 50,
                    table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id",
                    field_exprs: dict[str, str] | None = None) -> str:
    """Sub-aggregation oracle: (value, count, sum, avg, min, max) per
    `by` bucket — mirrors IndexReader.facet_stats (bucket count
    includes metric-NULL docs; stats exclude them; avg = sum/count of
    non-null metric values)."""
    m = _membership_sql(query, table, text_col, id_col, field_exprs)
    return f"""SELECT value, "count", sum, avg, min, max FROM (
  SELECT CAST(d.{by} AS VARCHAR) AS value,
         count(*) AS "count",
         CAST(sum(d.{metric}) AS DOUBLE) AS sum,
         CAST(sum(d.{metric}) AS DOUBLE)
           / count(d.{metric}) AS avg,
         CAST(min(d.{metric}) AS DOUBLE) AS min,
         CAST(max(d.{metric}) AS DOUBLE) AS max,
         row_number() OVER (
           ORDER BY count(*) DESC, CAST(d.{by} AS VARCHAR) ASC) AS __r
  FROM ({m}) m JOIN {table} d ON d.{id_col} = m.doc_id
  WHERE d.{by} IS NOT NULL
  GROUP BY 1
) WHERE __r <= {k}
ORDER BY "count" DESC, value ASC"""


def cardinality_sql(query: str, col: str,
                    table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id",
                    field_exprs: dict[str, str] | None = None) -> str:
    """Cardinality oracle: exact distinct `col` values among matching
    docs (NULLs ignored) — mirrors IndexReader.cardinality."""
    m = _membership_sql(query, table, text_col, id_col, field_exprs)
    return (f"SELECT count(DISTINCT d.{col}) AS cardinality "
            f"FROM ({m}) m JOIN {table} d ON d.{id_col} = m.doc_id")


def percentiles_sql(query: str, col: str, qs,
                    table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id",
                    field_exprs: dict[str, str] | None = None,
                    ts: bool = False) -> str:
    """Percentiles oracle: (q, value) per requested fraction — DuckDB
    quantile_disc over the matching docs' non-null values (the exact
    discrete quantile IndexReader.percentiles computes from its merged
    CDF)."""
    m = _membership_sql(query, table, text_col, id_col, field_exprs)
    v = f"epoch(d.{col})" if ts else f"CAST(d.{col} AS DOUBLE)"
    parts = [f"""SELECT {float(q)!r} AS q,
       quantile_disc({v}, {float(q)!r}) AS value
FROM ({m}) m JOIN {table} d ON d.{id_col} = m.doc_id
WHERE d.{col} IS NOT NULL""" for q in qs]
    return (" UNION ALL ".join(f"({p})" for p in parts)
            + " ORDER BY q")


def _membership_sql(query: str, table: str, text_col: str,
                    id_col: str,
                    field_exprs: dict[str, str] | None) -> str:
    """(doc_id, …) subquery of docs matching `query` — bm25 membership
    for posting-backed queries, the row-store match-all path
    otherwise (shared by the aggregation oracles)."""
    pq = parse_query(query, scored_fields=tuple(field_exprs or ()))
    if any(c.kind in ("term", "phrase", "filter", "termset")
           for c in pq.positive):
        return bm25_search_sql(query, k=None, table=table,
                               text_col=text_col, id_col=id_col,
                               field_exprs=field_exprs)
    return match_all_sql(query, k=None, table=table,
                         text_col=text_col, id_col=id_col)


def signals_sql(query: str, table: str = "documents",
                text_col: str = "text", id_col: str = "doc_id") -> str:
    """Per-doc signals oracle: (doc_id, bm25, coverage, idf_sum) for
    docs matching any query term — mirrors IndexReader.signals
    (reference semantics computer/mod.rs:61-143)."""
    pq = parse_query(query)
    terms = [c.tokens[0] for c in pq.positive]
    assert all(c.kind == "term" for c in pq.clauses)
    terms_in = ", ".join(_q(t) for t in terms)
    ctes = [base_ctes(table, text_col, id_col)]
    ctes.append(f"""tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok WHERE term IN ({terms_in}) GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE term IN ({terms_in}) GROUP BY term
)""")
    joins = ["CROSS JOIN stats s"]
    bm25_terms, found_flags, idf_terms, any_conds = [], [], [], []
    for ci, t in enumerate(terms):
        a = f"t{ci}"
        joins.append(f"LEFT JOIN tf {a} ON {a}.doc_id = cand.doc_id "
                     f"AND {a}.term = {_q(t)}")
        bm25_terms.append(
            f"COALESCE({_idf(t)} * {_tf_factor(f'{a}.tf')}, 0.0)")
        found_flags.append(
            f"(CASE WHEN {a}.tf IS NOT NULL THEN 1 ELSE 0 END)")
        idf_terms.append(
            f"(CASE WHEN {a}.tf IS NOT NULL THEN {_idf(t)} "
            f"ELSE 0.0 END)")
        any_conds.append(
            f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = cand.doc_id "
            f"AND tf.term = {_q(t)})")
    return f"""WITH {', '.join(ctes)},
cand AS (
  SELECT cand.doc_id, cand.fnq FROM dlq cand
  WHERE {' OR '.join(any_conds)}
)
SELECT cand.doc_id AS doc_id,
       round({' + '.join(bm25_terms)}, 4) AS bm25,
       round(({' + '.join(found_flags)}) / {float(len(terms))}, 6)
         AS coverage,
       round({' + '.join(idf_terms)}, 4) AS idf_sum
FROM cand {' '.join(joins)}"""


def mlt_sql(doc_id: int, max_terms: int = 10, k: int | None = None,
            table: str = "documents", text_col: str = "text",
            id_col: str = "doc_id", round_to: int = 4) -> str:
    """More-like-this oracle: select the source doc's top tf*idf terms
    (w desc, term asc, LIMIT max_terms — identical f64 expression tree
    to the engine's selection), then score the scored disjunction of
    those terms with BM25 (sum over matched selected terms)."""
    base = base_ctes(table, text_col, id_col)
    sql = f"""WITH {base},
tf_all AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
  GROUP BY doc_id, term
),
dfs_all AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
  GROUP BY term
),
sel AS (
  SELECT t.term
  FROM tf_all t JOIN dfs_all d USING (term) CROSS JOIN stats s
  WHERE t.doc_id = {doc_id}
  ORDER BY t.tf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) DESC,
           t.term
  LIMIT {max_terms}
),
cand AS (
  SELECT q.doc_id, q.fnq FROM dlq q
  WHERE EXISTS (SELECT 1 FROM tf_all t JOIN sel USING (term)
                WHERE t.doc_id = q.doc_id)
)
SELECT cand.doc_id AS doc_id,
       round(sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * 2.2) / (t.tf + 1.2 *
                    (1 - 0.75 + 0.75 * cand.fnq / s.avgfn))),
             {round_to}) AS score
FROM cand
JOIN tf_all t ON t.doc_id = cand.doc_id
JOIN sel ON sel.term = t.term
JOIN dfs_all d ON d.term = t.term
CROSS JOIN stats s
GROUP BY cand.doc_id, cand.fnq
ORDER BY score DESC, doc_id ASC"""
    if k is not None:
        sql += f"\nLIMIT {k}"
    return sql


def explain_sql(tokens: tuple[str, ...],
                table: str = "documents", text_col: str = "text",
                id_col: str = "doc_id") -> str:
    """Explain oracle: take the top-1 doc of the conjunctive query over
    `tokens` (score desc, doc_id asc — rank-identical to the engine),
    then emit one row per query term with the Lucene-format BM25
    breakdown the engine's explain() produces (tantivy bm25.rs:198-228):
    freq, dl (the QUANTIZED fieldnorm, id_to_fieldnorm), idf,
    tf_factor = freq/(freq+norm), and the term's score contribution."""
    base = base_ctes(table, text_col, id_col)
    terms_in = ", ".join(_q(t) for t in tokens)
    n = len(tokens)
    return f"""WITH {base},
tfq AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok WHERE term IN ({terms_in}) GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE term IN ({terms_in}) GROUP BY term
),
cand AS (
  SELECT q.doc_id, q.fnq FROM dlq q
  WHERE (SELECT count(DISTINCT term) FROM tfq t
         WHERE t.doc_id = q.doc_id) = {n}
),
scored AS (
  SELECT cand.doc_id, cand.fnq,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * 2.2) / (t.tf + 1.2 *
                (1 - 0.75 + 0.75 * cand.fnq / s.avgfn))) AS score
  FROM cand
  JOIN tfq t USING (doc_id) JOIN dfs d USING (term)
  CROSS JOIN stats s
  GROUP BY cand.doc_id, cand.fnq
),
top1 AS (SELECT doc_id, fnq FROM scored
         ORDER BY score DESC, doc_id LIMIT 1)
SELECT top1.doc_id::BIGINT AS doc_id,
       t.term AS term,
       t.tf AS freq,
       top1.fnq::DOUBLE AS dl,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
       round(t.tf / (t.tf + 1.2 *
             (1 - 0.75 + 0.75 * top1.fnq / s.avgfn)), 6) AS tf_factor,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * 2.2) / (t.tf + 1.2 *
                (1 - 0.75 + 0.75 * top1.fnq / s.avgfn)), 4)
           AS term_score
FROM top1
JOIN tfq t USING (doc_id) JOIN dfs d USING (term)
CROSS JOIN stats s
ORDER BY term"""


def suggest_sql(tokens: list[str], d: int = 2, k: int = 3,
                table: str = "documents", text_col: str = "text",
                id_col: str = "doc_id") -> str:
    """Spell-suggestion oracle: per typo token, dictionary terms within
    Levenshtein d ranked (ed asc, df desc, term asc), top-k — mirrors
    IndexReader.suggest_terms."""
    base = base_ctes(table, text_col, id_col)
    parts = []
    for tok in tokens:
        parts.append(f"""(
  SELECT {_q(tok)} AS token, term AS suggestion,
         levenshtein(term, {_q(tok)})::BIGINT AS ed, df
  FROM dfs_all
  WHERE levenshtein(term, {_q(tok)}) <= {d} AND term != {_q(tok)}
  ORDER BY ed, df DESC, term LIMIT {k})""")
    return f"""WITH {base},
dfs_all AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
  GROUP BY term
)
SELECT * FROM ({' UNION ALL '.join(parts)})
ORDER BY token, ed, df DESC, suggestion"""


def count_sql(query: str, table: str = "documents",
              text_col: str = "text", id_col: str = "doc_id",
              attr_exprs: dict[str, str] | None = None) -> str:
    """Exact match count of a query: single row (n)."""
    pq = parse_query(query)
    ctes = [base_ctes(table, text_col, id_col)]
    conds = []
    for ci, c in enumerate(pq.positive):
        if c.kind == "term":
            conds.append(
                f"EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = dl.doc_id "
                f"AND tok.term = {_q(c.tokens[0])})")
        elif c.kind == "termset":
            any_m = " OR ".join(
                f"EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = dl.doc_id "
                f"AND tok.term = {_q(m)})" for m in c.tokens)
            conds.append(f"({any_m})")
        elif c.kind == "all":
            pass  # matches every doc
        elif c.kind == "exists":
            conds.append(_exists_cond(c, table, id_col, "dl.doc_id",
                                      attr_exprs))
        elif c.kind == "filter":
            conds.append(_filter_cond(c.tokens[0], table, id_col,
                                      "dl.doc_id"))
        elif c.kind == "range":
            conds.append(_range_cond(c, table, id_col, "dl.doc_id"))
        else:
            ctes.append(_phrase_cte(f"ph{ci}", c.tokens, c.slop))
            conds.append(f"EXISTS (SELECT 1 FROM ph{ci} "
                         f"WHERE ph{ci}.doc_id = dl.doc_id)")
    for c in pq.negative:
        inner = " AND ".join(
            _filter_cond(t, table, id_col, "dl.doc_id")
            if ":" in t else
            f"EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = dl.doc_id "
            f"AND tok.term = {_q(t)})" for t in c.tokens)
        conds.append(f"NOT ({inner})")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT count(*)::BIGINT AS n FROM dl "
            f"WHERE {' AND '.join(conds) if conds else 'TRUE'}")


def match_all_sql(query: str, k: int | None = None,
                  table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id", offset: int = 0,
                  const_score: float | None = None,
                  attr_exprs: dict[str, str] | None = None) -> str:
    """(doc_id, score) for queries with no posting-backed positive
    clause (`*`, `* n_chars:>100`, `* -tool:* -error`) — the engine's
    `_search_all` row-store path (tantivy AllQuery): every doc passing
    the range/exists filters and no negated group matches; score =
    Σ boosts of the `*` clauses (or const_score)."""
    pq = parse_query(query)
    if any(c.kind in ("term", "phrase", "filter", "termset")
           for c in pq.positive):
        raise ValueError("match_all_sql is for pure match-all queries; "
                         "use bm25_search_sql")
    score = (const_score if const_score is not None
             else sum(c.boost for c in pq.positive if c.kind == "all"))
    ctes = [base_ctes(table, text_col, id_col)]
    conds = []
    for c in pq.positive:
        if c.kind == "range":
            conds.append(_range_cond(c, table, id_col, "dl.doc_id"))
        elif c.kind == "exists":
            conds.append(_exists_cond(c, table, id_col, "dl.doc_id",
                                      attr_exprs))
    for c in pq.negative:
        inner = " AND ".join(
            _filter_cond(t, table, id_col, "dl.doc_id")
            if ":" in t else
            f"EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = dl.doc_id "
            f"AND tok.term = {_q(t)})" for t in c.tokens)
        conds.append(f"NOT ({inner})")
    sql = (f"WITH {', '.join(ctes)} "
           f"SELECT dl.doc_id AS doc_id, "
           f"round({float(score)!r}, 4) AS score FROM dl "
           f"WHERE {' AND '.join(conds) if conds else 'TRUE'} "
           f"ORDER BY score DESC, doc_id ASC")
    if k is not None:
        sql += f" LIMIT {k}"
    if offset:
        sql += f" OFFSET {offset}"
    return sql


def term_stats_sql(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    return (f"WITH {base_ctes(table, text_col, id_col)} "
            f"SELECT term, count(DISTINCT doc_id)::BIGINT AS df, "
            f"count(*)::BIGINT AS ttf FROM tok GROUP BY term")


def doc_stats_sql(table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    return (f"WITH {base_ctes(table, text_col, id_col)} "
            f"SELECT doc_id, doclen::INT AS doclen, "
            f"(SELECT (count(*) - 1)::INT FROM fnt WHERE val <= doclen) "
            f"AS fieldnorm_id FROM dlq")


# ---------------------------------------------------------------------------
# dedup oracles

def rake_sql(stopwords: tuple[str, ...], max_words: int = 5,
             summary_sentences: int = 16, table: str = "documents",
             text_col: str = "text", id_col: str = "doc_id",
             round_to: int = 6) -> str:
    """RAKE keyword oracle mirroring ops.rake.rake_keywords (reference
    rake.rs): summary top sentences by word frequency, stopword-run
    phrase candidates (2..max_words), degree/freq scores, dedup, the
    distinct-words/3 cap BEFORE the length/score filters."""
    sw = ", ".join(_q(w) for w in stopwords)
    return f"""WITH sents AS (
  SELECT doc_id, generate_subscripts(arr, 1) - 1 AS sent_idx,
         unnest(arr) AS sent
  FROM (SELECT {id_col} AS doc_id,
               regexp_split_to_array(lower({text_col}),
                                     '[,.!?\\n\\r\\t…‥․]') AS arr
        FROM {table})
),
w2 AS (
  SELECT doc_id, sent_idx, widx, word, word IN ({sw}) AS is_stop
  FROM (SELECT doc_id, sent_idx,
               generate_subscripts(w, 1) - 1 AS widx,
               unnest(w) AS word
        FROM (SELECT doc_id, sent_idx,
                     regexp_split_to_array(trim(sent), '\\s+') AS w
              FROM sents))
  WHERE word != ''
),
freq AS (SELECT doc_id, word, count(*) AS f FROM w2
         WHERE NOT is_stop GROUP BY doc_id, word),
sscore AS (
  SELECT w.doc_id, w.sent_idx, sum(coalesce(f.f, 0)) AS sc
  FROM w2 w LEFT JOIN freq f USING (doc_id, word)
  GROUP BY w.doc_id, w.sent_idx
),
kept AS (
  SELECT doc_id, sent_idx FROM (
    SELECT doc_id, sent_idx,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY sc DESC, sent_idx ASC) AS rn
    FROM sscore)
  WHERE rn <= {summary_sentences}
),
kw AS (
  SELECT w.*, sum(is_stop::int) OVER (
      PARTITION BY w.doc_id, w.sent_idx ORDER BY widx) AS phrase_id
  FROM w2 w JOIN kept USING (doc_id, sent_idx)
),
pwords AS (SELECT * FROM kw WHERE NOT is_stop),
phr AS (
  SELECT doc_id, sent_idx, phrase_id,
         string_agg(word, ' ' ORDER BY widx) AS phrase,
         count(*) AS nwords
  FROM pwords GROUP BY doc_id, sent_idx, phrase_id
  HAVING count(*) > 1 AND count(*) <= {max_words}
),
pw AS (
  SELECT p.doc_id, p.sent_idx, p.phrase_id, p.phrase, p.nwords,
         w.word
  FROM phr p JOIN pwords w USING (doc_id, sent_idx, phrase_id)
),
stats AS (SELECT doc_id, word, count(*)::DOUBLE AS wf,
                 sum(nwords - 1)::DOUBLE AS wd
          FROM pw GROUP BY doc_id, word),
scored AS (
  SELECT pw.doc_id, pw.sent_idx, pw.phrase_id, pw.phrase,
         avg(s.wd / s.wf) AS score
  FROM pw JOIN stats s USING (doc_id, word)
  GROUP BY pw.doc_id, pw.sent_idx, pw.phrase_id, pw.phrase
),
dedup AS (SELECT doc_id, phrase, min(score) AS score
          FROM scored GROUP BY doc_id, phrase),
caps AS (SELECT doc_id, (count(DISTINCT word) // 3)::BIGINT AS cap
         FROM stats GROUP BY doc_id)
SELECT doc_id, phrase, round(score, {round_to}) AS score
FROM (SELECT d.doc_id, d.phrase, d.score, c.cap,
             row_number() OVER (PARTITION BY d.doc_id
                                ORDER BY d.score DESC,
                                         d.phrase ASC) AS rn
      FROM dedup d JOIN caps c USING (doc_id))
WHERE rn <= cap AND len(phrase) > 1 AND score > 0.0"""


def nb_classify_sql(label_col: str = "lang", table: str = "documents",
                    text_col: str = "text", id_col: str = "doc_id",
                    round_to: int = 4) -> str:
    """Naive-Bayes classify oracle mirroring ops.classify exactly
    (reference arithmetic, naive_bayes.rs): train on even ids with a
    non-null label, predict odd ids; whitespace tokens, idf =
    ln(N/(1+df))+1, Laplace per-class log-probs, 0.5 unseen default,
    MIN-log-prob selection (label asc ties), confidence = best/sum
    clamped >= 0."""
    return f"""WITH train AS (
  SELECT {id_col} AS doc_id, {label_col} AS label, {text_col} AS text
  FROM {table} WHERE {id_col} % 2 = 0 AND {label_col} IS NOT NULL
),
tst AS (SELECT {id_col} AS doc_id, {text_col} AS text
        FROM {table} WHERE {id_col} % 2 = 1),
nstat AS (SELECT count(*)::DOUBLE AS n FROM train),
ttf AS (
  SELECT doc_id, label, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, label,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM train)
  WHERE term != '' GROUP BY doc_id, label, term
),
idf AS (
  SELECT term,
         ln((SELECT n FROM nstat) / (1 + count(*))) + 1.0 AS idf
  FROM ttf GROUP BY term
),
val AS (SELECT t.doc_id, t.label, t.term, t.tf * i.idf AS value
        FROM ttf t JOIN idf i USING (term)),
tot AS (SELECT label, sum(value) AS total FROM val GROUP BY label),
flp AS (
  SELECT v.label, v.term,
         ln((sum(v.value) + 1.0) / (t.total + 1.0)) AS log_prob
  FROM val v JOIN tot t USING (label)
  GROUP BY v.label, v.term, t.total
),
priors AS (
  SELECT label, ln(count(*) / (SELECT n FROM nstat)) AS log_prior
  FROM train GROUP BY label
),
ptf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM tst)
  WHERE term != '' GROUP BY doc_id, term
),
pval AS (SELECT p.doc_id, p.term, p.tf * i.idf AS value
         FROM ptf p JOIN idf i USING (term)),
contrib AS (
  SELECT p.doc_id, c.label,
         sum(p.value * coalesce(f.log_prob, 0.5)) AS mass
  FROM pval p CROSS JOIN (SELECT label FROM priors) c
  LEFT JOIN flp f ON f.label = c.label AND f.term = p.term
  GROUP BY p.doc_id, c.label
),
scored AS (
  SELECT d.doc_id, pr.label,
         pr.log_prior + coalesce(co.mass, 0.0) AS lp
  FROM tst d CROSS JOIN priors pr
  LEFT JOIN contrib co
    ON co.doc_id = d.doc_id AND co.label = pr.label
),
sel AS (
  SELECT doc_id, label, lp,
         sum(lp) OVER (PARTITION BY doc_id) AS s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY lp ASC, label ASC) AS rn
  FROM scored
)
SELECT doc_id, label,
       round(greatest(lp / s, 0.0), {round_to}) AS confidence
FROM sel WHERE rn = 1 ORDER BY doc_id"""


SHINGLES_CTE = """
sh AS (
  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
    THEN list_transform(range(len(t) - 2),
                        i -> array_to_string(t[i+1:i+3], ' '))
    ELSE [array_to_string(t, ' ')] END)) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents)
)"""


def minhash_lsh_sql(num_hashes: int, bands: int,
                    threshold: float) -> str:
    """MinHash+LSH near-dup pairs oracle, parameterized banding:
    num_hashes minhashes -> `bands` bands of num_hashes/bands rows ->
    candidate pairs sharing a band -> exact shingle Jaccard >= threshold.
    Mirrors ops/dedup.minhash_lsh_pairs for any (num_hashes, bands)."""
    from .ops.hashing import h60_duckdb as h

    rows = num_hashes // bands
    mh_cols = ", ".join(
        "min({expr}) AS mh_{i}".format(
            expr=h("'{i}|' || shingle".format(i=i)), i=i)
        for i in range(num_hashes))
    band_case = " ".join(
        "WHEN {b} THEN [{vals}]".format(
            b=b, vals=", ".join(f"mh_{b * rows + r}" for r in range(rows)))
        for b in range(bands))
    return f"""
WITH {SHINGLES_CTE},
mh AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bv AS (
  SELECT doc_id, b, CASE b {band_case} END AS val
  FROM mh, range({bands}) r(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bv a JOIN bv b ON a.b = b.b AND a.val = b.val
                     AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT doc_a, doc_b,
         round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
) WHERE jaccard >= {threshold}"""


# ---------------------------------------------------------------------------
# ANN oracles: the approximations themselves are deterministic, so the
# full LSH / IVF pipelines are expressible in plain SQL and hash-checked
# (not just recall-bounded). Mirrors ops/similarity.py exactly.

_KNN_RERANK = """
SELECT e.vec_id AS vec_id,
       round(list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[])) * q.qn),
             6) AS cosine
FROM embeddings e
JOIN cand USING (vec_id),
     (SELECT embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id = 0) q
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}"""


def _unn_cte(dim: int) -> str:
    """(vec_id, j, v): embeddings unnested with component index."""
    return (f"unn AS (\n  SELECT vec_id, j, embedding[j+1]::DOUBLE AS v\n"
            f"  FROM embeddings, range({dim}) r(j)\n)")


def lsh_knn_sql(dim: int = 64, nbits: int = 6, k: int = 10,
                seed: str = "lsh") -> str:
    """Random-hyperplane LSH kNN: md5-seeded hyperplanes -> sign
    signature -> hamming<=1 probe -> exact cosine rerank. Same math as
    ops/similarity.lsh_knn (sign margins ~1e-4 >> f64 sum-order noise)."""
    return f"""
WITH planes AS (
  SELECT i, j,
         ((('0x' || substr(md5('{seed}|' || i::VARCHAR || '|'
                               || j::VARCHAR), 1, 8))::BIGINT
           / 4294967295.0) * 2.0 - 1.0) AS w
  FROM range({nbits}) p(i), range({dim}) d(j)
),
{_unn_cte(dim)},
dots AS (
  SELECT u.vec_id, p.i, sum(u.v * p.w) AS dot
  FROM unn u JOIN planes p USING (j)
  GROUP BY 1, 2
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT
           AS bucket
  FROM dots GROUP BY vec_id
),
qb AS (SELECT bucket AS qbucket FROM sig WHERE vec_id = 0),
cand AS (
  SELECT s.vec_id FROM sig s, qb
  WHERE bit_count(xor(s.bucket, qb.qbucket)) <= 1
)
{_KNN_RERANK.format(k=k)}"""


def ivf_knn_sql(dim: int = 64, ncells: int = 8, nprobe: int = 3,
                iters: int = 5, k: int = 10,
                sample_cap: int = 2048) -> str:
    """IVF kNN with the kmeans-lite training unrolled: init = sample rows
    at ranks (i*n)//ncells, cosine-argmax assignment (ties -> lowest
    cell), centroid mean rounded half-away to 6 decimals per iteration
    (kills cross-engine summation-order drift), empty cells keep their
    centroid. Mirrors ops/similarity.train_ivf_centroids / ivf_knn."""
    its = []
    for t in range(iters):
        its.append(f"""
cn{t} AS (SELECT cell, sqrt(sum(w*w)) AS nc FROM cents{t} GROUP BY cell),
sim{t} AS MATERIALIZED (
  SELECT u.vec_id, c.cell, sum(u.v * c.w) AS dot
  FROM unn u JOIN samp s USING (vec_id) JOIN cents{t} c USING (j)
  GROUP BY 1, 2
),
asg{t} AS (
  SELECT vec_id, cell FROM (
    SELECT m.vec_id, m.cell,
           row_number() OVER (PARTITION BY m.vec_id
             ORDER BY m.dot / (v.nv * c.nc) DESC, m.cell ASC) AS rn
    FROM sim{t} m JOIN vnorm v USING (vec_id) JOIN cn{t} c USING (cell)
  ) WHERE rn = 1
),
upd{t} AS (
  SELECT a.cell, u.j, round(avg(u.v), 6) AS w
  FROM asg{t} a JOIN unn u USING (vec_id)
  GROUP BY 1, 2
),
cents{t + 1} AS MATERIALIZED (
  SELECT c.cell, c.j, coalesce(up.w, c.w) AS w
  FROM cents{t} c LEFT JOIN upd{t} up ON up.cell = c.cell AND up.j = c.j
)""")
    n = iters
    return f"""
WITH {_unn_cte(dim)},
vnorm AS (SELECT vec_id, sqrt(sum(v*v)) AS nv FROM unn GROUP BY vec_id),
ranked AS (
  SELECT vec_id, row_number() OVER (
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rnk
  FROM embeddings
),
samp AS (SELECT vec_id FROM ranked WHERE rnk < {sample_cap}),
ns AS (SELECT count(*)::BIGINT AS n FROM samp),
cents0 AS MATERIALIZED (
  SELECT ci.i AS cell, u.j, u.v AS w
  FROM range({ncells}) ci(i)
  CROSS JOIN ns
  JOIN ranked r ON r.rnk = (ci.i * ns.n) // {ncells}
  JOIN unn u ON u.vec_id = r.vec_id
),{",".join(its)},
fin_cn AS (SELECT cell, sqrt(sum(w*w)) AS nc FROM cents{n} GROUP BY cell),
fin_sim AS MATERIALIZED (
  SELECT u.vec_id, c.cell, sum(u.v * c.w) AS dot
  FROM unn u JOIN cents{n} c USING (j)
  GROUP BY 1, 2
),
fin_asg AS (
  SELECT vec_id, cell FROM (
    SELECT m.vec_id, m.cell,
           row_number() OVER (PARTITION BY m.vec_id
             ORDER BY m.dot / (v.nv * c.nc) DESC, m.cell ASC) AS rn
    FROM fin_sim m JOIN vnorm v USING (vec_id)
    JOIN fin_cn c USING (cell)
  ) WHERE rn = 1
),
probes AS (
  SELECT cell FROM (
    SELECT m.cell,
           row_number() OVER (
             ORDER BY m.dot / (v.nv * c.nc) DESC, m.cell ASC) AS rn
    FROM fin_sim m JOIN vnorm v USING (vec_id)
    JOIN fin_cn c USING (cell)
    WHERE m.vec_id = 0
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT vec_id FROM fin_asg WHERE cell IN (SELECT cell FROM probes)
)
{_KNN_RERANK.format(k=k)}"""


def embedding_near_dup_lsh_sql(dim: int = 64, bands: int = 16,
                               band_bits: int = 2, threshold: float = 0.5,
                               seed: str = "emb-dedup") -> str:
    """LSH-banded embedding near-dup: same hyperplane signature,
    band-bucket candidate join, exact cosine rerank as
    ops/dedup.embedding_near_dup_pairs."""
    nbits = bands * band_bits
    mask = (1 << band_bits) - 1
    return f"""
WITH planes AS (
  SELECT i, j,
         ((('0x' || substr(md5('{seed}|' || i::VARCHAR || '|'
                               || j::VARCHAR), 1, 8))::BIGINT
           / 4294967295.0) * 2.0 - 1.0) AS w
  FROM range({nbits}) p(i), range({dim}) d(j)
),
{_unn_cte(dim)},
dots AS (
  SELECT u.vec_id, p.i, sum(u.v * p.w) AS dot
  FROM unn u JOIN planes p USING (j)
  GROUP BY 1, 2
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT
           AS bucket
  FROM dots GROUP BY vec_id
),
bv AS (
  SELECT vec_id, b, (bucket >> (b * {band_bits})) & {mask} AS val
  FROM sig, range({bands}) r(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bv a JOIN bv b ON a.b = b.b AND a.val = b.val
                     AND a.vec_id < b.vec_id
)
SELECT * FROM (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(ea.embedding::DOUBLE[],
                                eb.embedding::DOUBLE[])
               / (sqrt(list_dot_product(ea.embedding::DOUBLE[],
                                        ea.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(eb.embedding::DOUBLE[],
                                          eb.embedding::DOUBLE[]))),
               6) AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
) WHERE cosine >= {threshold}"""


def snippet_sql(query: str, k: int = 10, window: int = 24,
                max_chars: int = 200, table: str = "documents",
                text_col: str = "text", id_col: str = "doc_id") -> str:
    """(doc_id, snippet) for the query's top-k — replicates
    queryengine/snippet.make_snippet: sliding token window of
    min(window, n) scored as sum over sorted query terms of
    idf_t * (exact integer in-window count of t); earliest max wins;
    matches wrapped in <b></b>; truncation at max_chars + 7*matches;
    ellipsis affixes. Integer prefix counts keep window sums float-exact
    on both engines, so tie-breaks agree."""
    pq = parse_query(query)
    qterms = sorted({t for c in pq.positive for t in c.tokens
                     if c.kind != "filter"})
    terms_in = ", ".join(_q(t) for t in qterms)
    inner = bm25_search_sql(query, k=k, table=table, text_col=text_col,
                            id_col=id_col)
    cnt_cols = ",\n    ".join(
        f"sum(CASE WHEN term = {_q(t)} THEN 1 ELSE 0 END) "
        f"OVER (PARTITION BY doc_id ORDER BY pos) AS c{i}"
        for i, t in enumerate(qterms))
    idf = lambda t: (f"(SELECT ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) "
                     f"FROM qdfs d, stats s WHERE d.term = {_q(t)})")
    score = " + ".join(
        f"{idf(t)} * (b.c{i} - coalesce(pr.c{i}, 0))"
        for i, t in enumerate(qterms))
    return f"""
WITH top AS (SELECT doc_id FROM ({inner}) ranked),
{base_ctes(table, text_col, id_col)},
qdfs AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE term IN ({terms_in}) GROUP BY term
),
ind AS (
  SELECT t.doc_id, t.pos, t.term
  FROM tok t JOIN top USING (doc_id)
),
params AS (
  SELECT doc_id, least({window}, count(*)) AS w, count(*) AS n
  FROM ind GROUP BY doc_id
),
ccs AS (
  SELECT doc_id, pos,
    {cnt_cols}
  FROM ind
),
sums AS (
  SELECT a.doc_id, a.pos AS start, {score} AS s
  FROM ccs a
  JOIN params p ON p.doc_id = a.doc_id
  JOIN ccs b ON b.doc_id = a.doc_id AND b.pos = a.pos + p.w - 1
  LEFT JOIN ccs pr ON pr.doc_id = a.doc_id AND pr.pos = a.pos - 1
),
best AS (
  SELECT doc_id, start FROM (
    SELECT doc_id, start,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY s DESC, start ASC) AS rn
    FROM sums) WHERE rn = 1
),
snip AS (
  SELECT i.doc_id,
         string_agg(CASE WHEN i.term IN ({terms_in})
                         THEN '<b>' || i.term || '</b>'
                         ELSE i.term END, ' ' ORDER BY i.pos) AS body,
         count(*) FILTER (WHERE i.term IN ({terms_in})) AS matches,
         b.start, p.w AS wlen, p.n AS n
  FROM ind i JOIN best b USING (doc_id) JOIN params p USING (doc_id)
  WHERE i.pos >= b.start AND i.pos < b.start + p.w
  GROUP BY i.doc_id, b.start, p.w, p.n
)
SELECT doc_id,
       (CASE WHEN start > 0 THEN '… ' ELSE '' END)
       || (CASE WHEN length(body) > {max_chars} + 7 * matches
                THEN substr(body, 1, {max_chars}) || '…' ELSE body END)
       || (CASE WHEN start + wlen < n THEN ' …' ELSE '' END) AS snippet
FROM snip"""
