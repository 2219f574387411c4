"""DuckDB oracle-SQL parity inside pytest: the generated BM25 SQL must
reproduce the Python oracle's full result set on the documents table
(sf0.001) — the same contract the driver's correctness gate checks."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return c


@pytest.fixture(scope="module")
def doc_oracle():
    from cuely_spark.oracle import OracleIndex

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    return OracleIndex(pdf["doc_id"].to_numpy(), pdf["text"].tolist(),
                       dtype=np.float64)


@pytest.mark.parametrize("q", ["merge", "merge table window",
                               '"batch batch"', "merge -window",
                               '"scan merge" table'])
def test_bm25_sql_matches_python_oracle(con, doc_oracle, q):
    from cuely_spark.oracle_sql import bm25_search_sql, count_sql

    sql = bm25_search_sql(q, k=None)
    got = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    docs, scores = doc_oracle.search(q, k=10**9)
    order = np.argsort(docs)
    exp = pd.DataFrame({"doc_id": docs[order],
                        "score": np.round(scores[order], 4)})
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], exp["score"], atol=2e-4)
    n = con.execute(count_sql(q)).fetchone()[0]
    assert n == doc_oracle.count(q)


def test_term_stats_sql(con, doc_oracle):
    from cuely_spark.oracle_sql import term_stats_sql

    got = con.execute(term_stats_sql()).df()
    got = dict(zip(got["term"], got["df"]))
    for t, plist in doc_oracle.postings.items():
        assert got[t] == len(plist), t
