"""Codec roundtrip property tests (FIXTURES.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cuely_spark.codec import (
    decode_docs,
    decode_positions,
    decode_tfs,
    encode_docs,
    encode_positions,
    encode_tfs,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr)) == arr).all()


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=400))
@settings(max_examples=200, deadline=None)
def test_docs_roundtrip(docset):
    docs = np.array(sorted(docset), dtype=np.int64)
    assert (decode_docs(encode_docs(docs)) == docs).all()


def test_docs_roundtrip_with_base():
    docs = np.array([128, 130, 999], dtype=np.int64)
    buf = encode_docs(docs, base=127)
    assert (decode_docs(buf, base=127) == docs).all()


@given(st.lists(st.integers(min_value=1, max_value=100000), max_size=300))
@settings(max_examples=100, deadline=None)
def test_tfs_roundtrip(tfs):
    arr = np.array(tfs, dtype=np.int64)
    assert (decode_tfs(encode_tfs(arr)) == arr).all()


@given(st.lists(st.lists(st.integers(min_value=0, max_value=5000),
                         min_size=1, max_size=20),
                max_size=50))
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(poslists):
    poslists = [sorted(set(p)) or [0] for p in poslists]
    concat = np.array([x for p in poslists for x in p], dtype=np.int64)
    counts = np.array([len(p) for p in poslists], dtype=np.int64)
    buf = encode_positions(concat, counts)
    assert (decode_positions(buf, counts) == concat).all()


def test_varbyte_known_bytes():
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
