"""Round-6 optimization internals, pinned against reference paths.

Each optimization that changed an operator's internals this round gets
a direct equivalence test here (beyond the e2e suites that also cover
them): batch block decode vs per-block decode, the varbyte fast path vs
the generic encoder, and the Arrow tokenize/factorize vs the object
path. All pure-Python — no Spark session needed.
"""

import numpy as np
import pytest


def _random_postings(rng, nblocks=37, block=128):
    """Build a TermPostings with random doc gaps/tfs/fnids."""
    from cuely_spark.codec import encode_docs, encode_tfs
    from cuely_spark.queryengine.kernel import TermPostings

    first, last, ndocs = [], [], []
    docs_b, tfs_b, fn_b = [], [], []
    doc = -1
    for b in range(nblocks):
        n = int(rng.integers(1, block + 1)) if b == nblocks - 1 else block
        gaps = rng.integers(1, 2000, size=n)
        ds = doc + np.cumsum(gaps)
        doc = int(ds[-1])
        tfs = rng.integers(1, 300, size=n).astype(np.int64)
        fns = rng.integers(0, 256, size=n).astype(np.uint8)
        first.append(int(ds[0]))
        last.append(int(ds[-1]))
        ndocs.append(n)
        docs_b.append(encode_docs(ds))
        tfs_b.append(encode_tfs(tfs))
        fn_b.append(fns.tobytes())
    return TermPostings(first, last, ndocs, docs_b, tfs_b, fn_b)


def test_decode_blocks_batch_equals_per_block():
    """The joined-stream batch decode must equal per-block decoding for
    every subset shape (all blocks, random subsets, singletons)."""
    rng = np.random.default_rng(7)
    tp = _random_postings(rng)

    def reference(blocks):
        parts = [tp.decode_block(int(b)) for b in blocks]
        docs = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        fn = np.concatenate([p[2] for p in parts])
        owner = np.repeat(np.asarray(blocks, dtype=np.int64),
                          [len(p[0]) for p in parts])
        return docs, tfs, fn, owner

    subsets = [np.arange(tp.nblocks),
               np.array([0]), np.array([tp.nblocks - 1]),
               np.array([3, 4, 5]), np.array([0, 11, 36]),
               np.sort(rng.choice(tp.nblocks, size=9, replace=False))]
    for blocks in subsets:
        got = tp.decode_blocks(blocks)
        exp = reference(blocks)
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(g, e)


def test_decode_blocks_empty():
    from cuely_spark.queryengine.kernel import TermPostings

    tp = TermPostings([], [], [], [], [], [])
    d, t, f, o = tp.decode_blocks(np.empty(0, dtype=np.int64))
    assert d.size == t.size == f.size == o.size == 0


@pytest.mark.parametrize("hi", [2, 128, 2**14, 2**30, 2**45, 2**62])
def test_varbyte_fastpath_matches_generic(hi):
    """The size-capped group matrix (and the 1-byte cast fast path)
    must produce the same bytes as a per-value reference encoder."""
    from cuely_spark.codec import varbyte_decode, varbyte_encode

    rng = np.random.default_rng(hi % 97)
    v = rng.integers(0, hi, size=4000).astype(np.uint64)

    def ref_encode(values):
        out = bytearray()
        for x in values:
            x = int(x)
            while True:
                g = x & 0x7F
                x >>= 7
                out.append(g | 0x80 if x else g)
                if not x:
                    break
        return bytes(out)

    assert varbyte_encode(v) == ref_encode(v)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_tokenize_arrow_mixed_order_preserved():
    """The take-permutation mixed path must interleave Arrow-split and
    Python-tokenized rows in exact document order, equal to tokenizing
    every row with the exact tokenizer."""
    from cuely_spark.indexer.segment import (_tokenize_flat,
                                             _tokenize_flat_arrow)
    from cuely_spark.tokenizer import tokenize

    texts = ["plain simple words", "C++ and café!", "", "a b c",
             "Ünïcode — heavy; row", "another simple row here",
             "  ", "tail words"]
    flat_a, lens_a = _tokenize_flat_arrow(texts)
    flat_o, lens_o = _tokenize_flat(texts)
    expected = [tokenize(t) for t in texts]
    np.testing.assert_array_equal(lens_a, [len(e) for e in expected])
    np.testing.assert_array_equal(lens_a, lens_o)
    got = flat_a.to_pylist()
    assert got == [tok for e in expected for tok in e]
    assert list(flat_o) == got


def test_arrow_factorize_order_matches_pandas():
    """dictionary_encode + sorted-dictionary rank remap must reproduce
    pandas factorize(sort=True) codes and uniques exactly (byte order
    == codepoint order for valid UTF-8)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    rng = np.random.default_rng(3)
    vocab = ["zebra", "apple", "Straße", "café", "a", "zz", "1",
             "émile", "中文", "b:compound", "s:stem"]
    toks = [vocab[i] for i in rng.integers(0, len(vocab), size=5000)]
    arr = pa.array(toks, type=pa.string())
    enc = arr.dictionary_encode()
    dic = enc.dictionary
    sidx = pc.array_sort_indices(dic).to_numpy()
    rank = np.empty(sidx.size, dtype=np.int64)
    rank[sidx] = np.arange(sidx.size)
    codes = rank[enc.indices.to_numpy(zero_copy_only=False)]
    uniques = dic.take(sidx).to_pylist()
    pcodes, puniq = pd.factorize(np.asarray(toks, dtype=object),
                                 sort=True)
    np.testing.assert_array_equal(codes, pcodes)
    assert uniques == list(puniq)


def test_composite_sort_matches_lexsort():
    """The packed-uint64 radix argsort must order (code, doc, pos)
    exactly like the three-key lexsort it replaced."""
    rng = np.random.default_rng(11)
    n = 20000
    codes = rng.integers(0, 5000, size=n).astype(np.int64)
    docs = rng.integers(100, 90000, size=n).astype(np.int64)
    pos = rng.integers(0, 400, size=n).astype(np.int64)
    dmin = int(docs.min())
    bits_d = int(docs.max() - dmin + 1).bit_length()
    bits_p = int(pos.max() + 1).bit_length()
    key = ((codes.astype(np.uint64) << np.uint64(bits_d + bits_p))
           | ((docs - dmin).astype(np.uint64) << np.uint64(bits_p))
           | pos.astype(np.uint64))
    got = np.argsort(key, kind="stable")
    exp = np.lexsort((pos, docs, codes))
    # orders must agree on the sort keys (ties may permute equal rows,
    # but (code, doc, pos) triples here are almost surely unique; check
    # the sorted key tuples instead of raw indices to be exact)
    trip = lambda o: list(zip(codes[o], docs[o], pos[o]))  # noqa: E731
    assert trip(got) == trip(exp)
