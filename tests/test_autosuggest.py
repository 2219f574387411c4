"""Autosuggest (autosuggest.rs analog): fst-order prefix stream cap,
stable score ranking, alphabetical final order, ascii-lowercase query
folding."""
import numpy as np
import pandas as pd
import pytest

from cuely_spark.queryengine.autosuggest import Autosuggest, _ascii_lower


def test_ascii_lower():
    assert _ascii_lower("FooBAR") == "foobar"
    # non-ascii untouched (Rust to_ascii_lowercase)
    assert _ascii_lower("ÄBc") == "Äbc"


def test_ranking_and_final_sort():
    a = Autosuggest([("apple", 5.0), ("apply", 9.0), ("apt", 1.0),
                     ("banana", 99.0)])
    # score desc picks apply+apple+apt; output re-sorted alphabetically
    assert a.suggestions("ap") == ["apple", "apply", "apt"]
    assert a.suggestions("ap", k=2) == ["apple", "apply"]
    assert a.suggestions("b") == ["banana"]
    assert a.suggestions("zzz") == []
    # query folds to ascii lowercase before matching
    assert a.suggestions("AP", k=2) == ["apple", "apply"]


def test_stream_cap_is_lexicographic_before_scoring():
    # 70 phrases aa00..aa69 with ascending scores: the fst stream cap
    # (64, lexicographic) drops the highest-scored tail phrases
    # BEFORE ranking — reference autosuggest.rs:55-63 takes 64 from
    # the stream, then sorts by score
    phrases = [(f"aa{i:02d}", float(i)) for i in range(70)]
    a = Autosuggest(phrases)
    got = a.suggestions("aa")
    # top-10 by score among the first 64 lexicographic = aa54..aa63
    assert got == [f"aa{i}" for i in range(54, 64)]


def test_stable_tie_keeps_lexicographic():
    a = Autosuggest([("ab", 1.0), ("aa", 1.0), ("ac", 2.0)])
    # ranked: ac(2), then aa/ab tie in lexicographic (stable) order;
    # k=2 keeps ac+aa, final alphabetical
    assert a.suggestions("a", k=2) == ["aa", "ac"]


def test_duplicate_phrases_collapse():
    a = Autosuggest([("aa", 1.0), ("aa", 3.0)])
    assert a.scores() == {"aa": 3.0}
    assert a.suggestions("a") == ["aa"]


def test_from_key_phrases_integration(spark, tmp_path_factory):
    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    rng = np.random.default_rng(3)
    vocab = ["scan", "sort", "stream", "spark", "merge", "table"]
    rows = [(i, " ".join(rng.choice(vocab, int(rng.integers(3, 9)))))
            for i in range(200)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = str(tmp_path_factory.mktemp("idx_autosuggest"))
    build_index(spark, spark.createDataFrame(pdf), out,
                doc_id_col="doc_id", rows_per_segment=100)
    r = IndexReader(spark, out)
    a = Autosuggest.from_key_phrases(r, k=100)
    got = a.suggestions("s")
    assert set(got) <= {"scan", "sort", "stream", "spark"}
    assert got == sorted(got)
    # parity with the key-phrase table's own ranking
    kp = {row["term"]: row["score"]
          for row in r.top_key_phrases(k=100).collect()}
    expect = sorted(sorted((t for t in kp if t.startswith("s")),
                           key=lambda t: -kp[t])[:10])
    assert got == expect
