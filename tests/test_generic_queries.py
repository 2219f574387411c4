"""Generic point queries (reference: crates/core/src/generic_query/)."""

import pytest


@pytest.fixture(scope="module")
def reader(spark, transcripts_small, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]))
    out = str(tmp_path_factory.mktemp("idx_generic"))
    build_index(spark, df, out, rows_per_segment=2000)
    return IndexReader(spark, out)


def test_get_turn(reader, transcripts_small):
    exp = transcripts_small.iloc[123]
    rows = reader.get_turn(exp["conv_id"], int(exp["turn_idx"])).collect()
    assert len(rows) == 1
    assert rows[0]["text"] == exp["text"]
    assert rows[0]["doc_id"] == 123


def test_get_conversation(reader, transcripts_small):
    conv = transcripts_small.iloc[200]["conv_id"]
    exp = transcripts_small[transcripts_small["conv_id"] == conv]
    rows = reader.get_conversation(conv).collect()
    assert [r["turn_idx"] for r in rows] == exp["turn_idx"].tolist()
    assert [r["text"] for r in rows] == exp["text"].tolist()


def test_top_key_phrases(reader, oracle_small):
    import numpy as np

    rows = reader.top_key_phrases(k=10).collect()
    assert len(rows) == 10
    # recompute the expected scores from the oracle
    n = oracle_small.num_docs
    exp = []
    for term, plist in oracle_small.postings.items():
        df = len(plist)
        ttf = sum(len(p) for p in plist.values())
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        exp.append((term, round(ttf * idf, 4)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    assert [(r["term"], r["score"]) for r in rows] == exp[:10]


def test_approx_count_hybrid_branches(spark, transcripts_small,
                                      tmp_path_factory):
    """Uncapped segments report exact counts; a capped segment reports
    max(cap, independence estimate), and any cap taints exactness."""
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    df = spark.createDataFrame(
        transcripts_small.drop(columns=["expected_doc_id"]).head(900))
    out = str(tmp_path_factory.mktemp("approx_idx"))
    build_index(spark, df, out, rows_per_segment=300)  # 3 segments
    r = IndexReader(spark, out)
    exact_n = r.count("the test")
    n1, ex1 = r.approx_count_hybrid("the test",
                                    max_docs_per_segment=10**9)
    assert (n1, ex1) == (exact_n, True)
    n2, ex2 = r.approx_count_hybrid("the test", max_docs_per_segment=1)
    assert ex2 is False and n2 >= 3  # every segment capped at >=1
    assert r.approx_count_hybrid("zzzmissing")[0] == 0
