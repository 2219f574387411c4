"""Per-partition segment construction kernel (pure numpy, Spark-free).

The Spark analog of tantivy's in-memory postings writer + serializer
(reference: /root/reference/crates/tantivy/src/postings/postings_writer.rs,
serializer.rs:294-462): one partition of doc-sorted turns comes in, a
complete index segment comes out as flat rows:

- kind='p' posting blocks: per term, docs sorted ascending, chunked into
  blocks of 128 (compression/mod.rs:4); each block self-contained:
  delta-gap + varbyte docs (base -1), minus-one varbyte tfs, one raw u8
  fieldnorm id per doc (fieldnorms denormalized into blocks so query
  scoring never joins a doc table), delta-restart varbyte positions, and
  block-max metadata (block_max_tf, block_min_fnid) giving a safe BM25
  upper bound: score(min fieldnorm id, max tf) >= any doc in the block.
  [Deviation from the reference, which stores the argmax *pair* under the
  build-time weight (serializer.rs:365-416) — that bound is only valid if
  avg_fieldnorm never changes; (max tf, min fnid) is a true bound under
  any weight.]
- kind='t' per-term stats: (term, df, ttf) within the segment.
- kind='d' doc stats: (doc_id, doclen, fieldnorm_id).
- kind='g' one segment-summary row (num_docs, num_terms, total_tokens,
  posting_bytes) used for the manifest / lineage.

Everything is vectorized: one lexsort, reduceat aggregations, and a
single varbyte pass per stream split at block boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import BLOCK_SIZE
from ..codec import varbyte_encode_split
from ..fieldnorm import fieldnorm_to_id
from ..tokenizer import tokenize

# rows that the Arrow C++ space-split tokenizes identically to the full
# Default-tokenizer chain: already-lowercase alnum words, single spaces,
# no punctuation/unicode (then: segmentation, split-preserve, lowercase,
# NFKD and diacritics-strip are all identity)
_SIMPLE_ROW_RE = "^[a-z0-9]+( [a-z0-9]+)*$"


def _tokenize_flat_arrow(texts: list):
    """Tokenize a row batch -> (flat pyarrow StringArray, tokens-per-row).

    Vectorized fast path: rows matching _SIMPLE_ROW_RE are split by the
    Arrow C++ kernel (no per-row Python); everything else goes through
    the exact Python tokenizer. The flat token stream STAYS an Arrow
    array — no per-token Python string objects are materialized (that
    conversion plus the pandas object-hash factorize it fed were ~25%
    of the segment kernel). Outputs are order-preserving.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string())
    simple = pc.match_substring_regex(arr, _SIMPLE_ROW_RE)
    simple_np = simple.to_numpy(zero_copy_only=False)
    simple_np = np.where(np.equal(simple_np, None), False,
                         simple_np).astype(bool)
    n = len(texts)
    if simple_np.all():
        la = pc.split_pattern(arr, " ")
        lens = np.diff(la.offsets.to_numpy(zero_copy_only=False))
        return la.flatten(), lens.astype(np.int64)

    # mixed batch: tokenize the (typically few) non-simple rows in
    # Python, split the simple bulk with the Arrow kernel, concatenate
    # both source streams, and restore document order with ONE take()
    # through a scattered permutation — no per-row loop over the
    # simple rows
    lens = np.empty(n, dtype=np.int64)
    idx_simple = np.flatnonzero(simple_np)
    idx_py = np.flatnonzero(~simple_np)
    flat_sub = pa.array([], type=pa.string())
    sub_lens = np.empty(0, dtype=np.int64)
    if idx_simple.size:
        la = pc.split_pattern(arr.take(pa.array(idx_simple)), " ")
        sub_lens = np.diff(la.offsets.to_numpy(zero_copy_only=False))
        flat_sub = la.flatten()
        lens[idx_simple] = sub_lens
    py_toks: list = []
    py_lens = np.empty(idx_py.size, dtype=np.int64)
    for j, i in enumerate(idx_py):
        toks = tokenize(texts[i])
        py_toks.extend(toks)
        py_lens[j] = len(toks)
    lens[idx_py] = py_lens
    total = int(lens.sum())
    if total == 0:
        return pa.array([], type=pa.string()), lens
    cat = pa.concat_arrays([flat_sub,
                            pa.array(py_toks, type=pa.string())])
    perm = np.empty(total, dtype=np.int64)
    out_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])

    def _scatter(rows: np.ndarray, rlens: np.ndarray, src_off: int):
        tot = int(rlens.sum())
        if tot == 0:
            return
        intra = (np.arange(tot, dtype=np.int64)
                 - np.repeat(np.cumsum(rlens) - rlens, rlens))
        perm[np.repeat(out_starts[rows], rlens) + intra] = \
            src_off + np.arange(tot, dtype=np.int64)

    _scatter(idx_simple, sub_lens, 0)
    _scatter(idx_py, py_lens, len(flat_sub))
    return cat.take(pa.array(perm)), lens


def _tokenize_flat(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Object-array variant of :func:`_tokenize_flat_arrow` for the
    shadow-stream paths (stem / ngram / extra fields) that do Python
    string work on the tokens."""
    flat, lens = _tokenize_flat_arrow(texts)
    return (np.asarray(flat.to_numpy(zero_copy_only=False),
                       dtype=object), lens)

# Arrow/Spark schema for all emitted rows (union of the four kinds)
INDEX_ROW_SCHEMA = (
    "kind string, segment_id int, term string, block_id int, "
    "first_doc long, last_doc long, ndocs int, "
    "docs binary, tfs binary, fnids binary, positions binary, "
    "block_max_tf int, block_min_fnid int, "
    "doc_id long, doclen int, fieldnorm_id int, "
    "df long, ttf long, "
    "num_docs long, num_terms long, total_tokens long, posting_bytes long"
)

_COLS = [c.split()[0] for c in INDEX_ROW_SCHEMA.split(", ")]


def _empty_frame() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=object) for c in _COLS})


def build_segment_rows(
    doc_ids: np.ndarray,
    texts,
    segment_id: int,
    store_positions: bool = True,
    attr_tokens: list | None = None,
    ngram_max: int = 0,
    stem: bool = False,
    extra_fields: dict[str, list] | None = None,
    stem_langs: list | None = None,
) -> pd.DataFrame:
    """Build all index rows for one segment from (doc_id, text) pairs.

    `stem_langs` (optional, aligned with texts, requires stem=True):
    per-doc language codes routing each doc's stemmed shadow terms to
    that language's stemmer (en/de/fr/es; unknown -> English fallback,
    reference: text_field.rs:294-326). None = classic English Porter
    for every doc.

    `attr_tokens` (optional, aligned with texts): per-doc list of
    synthetic attribute terms like "role:user" — indexed as unscored
    filter postings (tf=1, position 0) and EXCLUDED from doc length /
    fieldnorms / total_tokens, so they never perturb BM25.

    `ngram_max` (0, 2 or 3): also index compound terms "b:"+tok_i+tok_{i+1}
    (and "t:"+three-token concat when 3) — the bigram/trigram shadow
    fields the reference plans compound-word queries against
    (crates/core/src/query/plan/mod.rs:223-300; doc-side tokenizers
    tokenizer/fields/{bigram,trigram}.rs). Like attr tokens they are
    excluded from doclen/fieldnorms, so plain-term BM25 is unchanged;
    compound matches are scored with the text field's fieldnorm
    (documented deviation: the reference keeps per-field fieldnorms).

    `extra_fields` (optional): {field_name: per-doc texts} — additional
    SCORED text fields, the multi-field data model of the reference
    (one inverted index per text field, per-field fieldnorms:
    crates/core/src/schema/text_field.rs:97-130). Field g's tokens are
    indexed as "f:{g}:{token}" postings whose denormalized fieldnorm
    ids quantize FIELD g's own doc length, and union-of-fields term
    stats are emitted as "u:{token}" t-rows — the AllBody-field df the
    reference's BM25F takes its IDF from (ranking/bm25f.rs:38-50).
    Shadow streams (stem / ngram) run over the primary field only.
    """
    import gc

    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return _empty_frame()
    # cyclic GC gen2 scans over millions of short-lived token objects
    # dominate in long-lived workers; refcounting frees everything here
    gc_was_enabled = gc.isenabled()
    gc.disable()
    try:
        return _build_segment_rows_inner(doc_ids, texts, segment_id,
                                         store_positions, attr_tokens,
                                         ngram_max, stem, extra_fields,
                                         stem_langs)
    finally:
        if gc_was_enabled:
            gc.enable()


def _ngram_stream(flat: np.ndarray, lens: np.ndarray, tok_docs: np.ndarray,
                  tok_pos: np.ndarray, k: int, prefix: str):
    """Compound tokens of width k from the flat token stream: one token
    per in-doc window start, prefixed (e.g. 'b:'+tok_i+tok_{i+1});
    docs with 1..k-1 tokens emit ONE token — the concat of all of them
    (reference NGramTokenStream fills a short window,
    tokenizer/fields/ngram.rs:46-83: bigram("test") == ["test"]).
    Vectorized elementwise object-array concat; windows never cross doc
    boundaries (mask on remaining in-doc length)."""
    parts_t: list[np.ndarray] = []
    parts_d: list[np.ndarray] = []
    parts_p: list[np.ndarray] = []
    total = flat.size
    if total >= k:
        # token i starts a window iff at least k tokens remain in its doc
        doc_len_of_tok = np.repeat(lens, lens)
        ok = tok_pos <= doc_len_of_tok - k
        idx = np.flatnonzero(ok)
        if idx.size:
            comp = np.full(idx.size, prefix, dtype=object)
            for off in range(k):
                comp = comp + flat[idx + off]
            parts_t.append(comp)
            parts_d.append(tok_docs[idx])
            parts_p.append(tok_pos[idx])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    for short_len in range(1, k):
        sel = np.flatnonzero(lens == short_len)
        if sel.size == 0:
            continue
        s = starts[sel]
        comp = np.full(sel.size, prefix, dtype=object)
        for off in range(short_len):
            comp = comp + flat[s + off]
        parts_t.append(comp)
        parts_d.append(tok_docs[s])
        parts_p.append(np.zeros(sel.size, dtype=np.int64))
    if not parts_t:
        z = np.empty(0, dtype=object)
        zi = np.empty(0, dtype=np.int64)
        return z, zi, zi
    return (np.concatenate(parts_t), np.concatenate(parts_d),
            np.concatenate(parts_p))


def _build_segment_rows_inner(
    doc_ids: np.ndarray,
    texts,
    segment_id: int,
    store_positions: bool,
    attr_tokens: list | None = None,
    ngram_max: int = 0,
    stem: bool = False,
    extra_fields: dict[str, list] | None = None,
    stem_langs: list | None = None,
) -> pd.DataFrame:
    n = doc_ids.size

    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    # shadow streams (stem / ngram / extra fields) do Python string
    # work on the tokens and need an object array; the plain path keeps
    # the token stream Arrow-native end to end (Arrow split -> Arrow
    # dictionary factorize below) and never materializes per-token
    # Python strings
    arrow_terms = not (stem or ngram_max >= 2 or extra_fields)
    tok_fn_ = _tokenize_flat_arrow if arrow_terms else _tokenize_flat
    flat, lens = tok_fn_([texts[i] for i in order])
    fnids_per_doc = fieldnorm_to_id(lens)
    total = int(lens.sum())

    # extra scored fields: tokenize each with its own doc lengths /
    # quantized fieldnorms (per-field fieldnorm contract,
    # crates/tantivy/src/fieldnorm/: one u8 per doc PER FIELD)
    efields: list[tuple[str, np.ndarray, np.ndarray, np.ndarray]] = []
    e_total = 0
    for fname, ftexts in (extra_fields or {}).items():
        eflat, elens = _tokenize_flat([ftexts[i] for i in order])
        efnids = fieldnorm_to_id(elens)
        efields.append((fname, eflat, elens, efnids))
        e_total += int(elens.sum())

    # ---- doc rows -------------------------------------------------------
    d_rows = pd.DataFrame({
        "kind": "d",
        "segment_id": segment_id,
        "doc_id": doc_ids,
        "doclen": lens.astype(np.int64),
        "fieldnorm_id": fnids_per_doc.astype(np.int64),
    })

    # attribute-filter prep happens BEFORE the empty-text early return so
    # a batch whose every doc has empty/whitespace text still indexes its
    # role:/lang: attr postings (consistent with mixed batches)
    attr_lists: list | None = None
    a_lens = None
    a_total = 0
    if attr_tokens is not None:
        attr_lists = [attr_tokens[i] for i in order]
        a_lens = np.fromiter((len(a) for a in attr_lists),
                             dtype=np.int64, count=n)
        a_total = int(a_lens.sum())

    if total == 0 and a_total == 0 and e_total == 0:
        g_rows = pd.DataFrame([{
            "kind": "g", "segment_id": segment_id, "num_docs": n,
            "num_terms": 0, "total_tokens": 0, "posting_bytes": 0,
        }])
        out = pd.concat([d_rows, g_rows], ignore_index=True)
        return out.reindex(columns=_COLS)

    terms_arr = flat
    tok_docs = np.repeat(doc_ids, lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # position of token within its doc
    tok_pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    # fieldnorm id carried per token (streams of different fields mix
    # in one sorted pass; a (term, doc) group is always single-field
    # because terms are field-namespaced)
    tok_fn = np.repeat(fnids_per_doc, lens).astype(np.int64)

    # shadow streams run over the ORIGINAL text-token stream only
    text_docs, text_pos = tok_docs, tok_pos

    if stem and total:
        # stemmed shadow postings "s:<stem>" (reference indexes
        # Snowball-stemmed shadow fields selected by detected language
        # with English fallback, schema/text_field.rs:294-326); stems
        # computed once per unique (token, lang), then gathered
        from ..stemmer import english_stem, stem_for_lang

        if stem_langs is None:
            uniq, inv = np.unique(flat.astype(str), return_inverse=True)
            stems = np.asarray(["s:" + english_stem(u) for u in uniq],
                               dtype=object)
            s_flat = stems[inv]
        else:
            doc_langs = np.asarray([stem_langs[i] for i in order],
                                   dtype=object)
            tok_langs = np.repeat(doc_langs, lens)
            s_flat = np.empty(total, dtype=object)
            for lg in np.unique(tok_langs.astype(str)):
                m = tok_langs == lg
                sub = flat[m].astype(str)
                uniq, inv = np.unique(sub, return_inverse=True)
                stems = np.asarray(
                    ["s:" + stem_for_lang(u, lg) for u in uniq],
                    dtype=object)
                s_flat[m] = stems[inv]
        terms_arr = np.concatenate([terms_arr, s_flat])
        tok_docs = np.concatenate([tok_docs, text_docs])
        tok_pos = np.concatenate([tok_pos, text_pos])
        tok_fn = np.concatenate([tok_fn, np.repeat(fnids_per_doc, lens)])
        total += s_flat.size

    if ngram_max >= 2 and total:
        # compound-term shadow postings (doclen/fieldnorms exclude them)
        widths = [2] + ([3] if ngram_max >= 3 else [])
        for w_, pre in zip(widths, ("b:", "t:")):
            ctoks, cdocs, cpos = _ngram_stream(
                flat, lens, text_docs, text_pos, w_, pre)
            if ctoks.size:
                terms_arr = np.concatenate([terms_arr, ctoks])
                tok_docs = np.concatenate([tok_docs, cdocs])
                tok_pos = np.concatenate([tok_pos, cpos])
                tok_fn = np.concatenate([
                    tok_fn,
                    fnids_per_doc[np.searchsorted(doc_ids, cdocs)]])
                total += ctoks.size

    # extra scored fields: "f:{name}:{token}" postings with the FIELD's
    # fieldnorm ids; positions are ordinals within the field's stream
    for fname, eflat, elens, efnids in efields:
        e_tot = int(elens.sum())
        if e_tot == 0:
            continue
        pre = np.full(e_tot, "f:" + fname + ":", dtype=object)
        terms_arr = np.concatenate([terms_arr, pre + eflat])
        tok_docs = np.concatenate([tok_docs, np.repeat(doc_ids, elens)])
        estarts = np.concatenate([[0], np.cumsum(elens)[:-1]])
        epos = (np.arange(e_tot, dtype=np.int64)
                - np.repeat(estarts, elens))
        tok_pos = np.concatenate([tok_pos, epos])
        tok_fn = np.concatenate([tok_fn, np.repeat(efnids, elens)])
        total += e_tot

    if attr_lists is not None:
        # append attribute-filter postings (tf=1, pos 0) — note doclen /
        # fieldnorm / total_tokens above already exclude them
        if a_total:
            a_toks = [t for al in attr_lists for t in al]
            if arrow_terms:
                import pyarrow as pa

                terms_arr = pa.concat_arrays(
                    [terms_arr, pa.array(a_toks, type=pa.string())])
            else:
                terms_arr = np.concatenate(
                    [terms_arr,
                     np.asarray(a_toks, dtype=object)])
            tok_docs = np.concatenate(
                [tok_docs, np.repeat(doc_ids, a_lens)])
            tok_pos = np.concatenate(
                [tok_pos, np.zeros(a_total, dtype=np.int64)])
            tok_fn = np.concatenate(
                [tok_fn, np.repeat(fnids_per_doc, a_lens)])
            total += a_total

    # sorted term dictionary order == UTF-8 byte order == codepoint order
    if arrow_terms:
        # Arrow-native factorize: C++ hash dictionary encode, sort the
        # (small) dictionary, remap codes through the rank permutation.
        # Byte order == codepoint order for valid UTF-8, so the term
        # order is identical to pandas factorize(sort=True).
        import pyarrow.compute as pc

        enc = terms_arr.dictionary_encode()
        dic = enc.dictionary
        sidx = pc.array_sort_indices(dic).to_numpy()
        rank = np.empty(sidx.size, dtype=np.int64)
        rank[sidx] = np.arange(sidx.size)
        codes = rank[enc.indices.to_numpy(zero_copy_only=False)]
        uniques = np.asarray(
            dic.take(sidx).to_numpy(zero_copy_only=False),
            dtype=object)
    else:
        codes, uniques = pd.factorize(terms_arr, sort=True)
        uniques = np.asarray(uniques, dtype=object)
    # (code, doc, pos) sort: pack into ONE uint64 key when the ranges
    # fit (they always do for real segments — code/doc/pos are each
    # far below 2^21) so numpy's radix argsort replaces the ~2x slower
    # three-key lexsort; identical order, lexsort fallback otherwise
    dmin = int(tok_docs.min())
    bits_d = int(tok_docs.max() - dmin + 1).bit_length()
    bits_p = int(tok_pos.max() + 1).bit_length()
    bits_c = int(codes.max() + 1).bit_length()
    if bits_c + bits_d + bits_p <= 63:
        key = ((codes.astype(np.uint64) << np.uint64(bits_d + bits_p))
               | ((tok_docs - dmin).astype(np.uint64)
                  << np.uint64(bits_p))
               | tok_pos.astype(np.uint64))
        order2 = np.argsort(key, kind="stable")
    else:  # pragma: no cover - pathological ranges
        order2 = np.lexsort((tok_pos, tok_docs, codes))
    c = codes[order2]
    d = tok_docs[order2]
    p = tok_pos[order2]
    fn_sorted = tok_fn[order2]

    # ---- (term, doc) groups ---------------------------------------------
    new_grp = np.empty(total, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    gstarts = np.flatnonzero(new_grp)
    gterm = c[gstarts]
    gdoc = d[gstarts]
    tfs = np.diff(np.append(gstarts, total)).astype(np.int64)

    # fieldnorm id per group, carried with the tokens (field-dependent:
    # an extra-field group quantizes that field's doc length)
    gfn = fn_sorted[gstarts].astype(np.int64)

    # ---- per-term ranges --------------------------------------------------
    ngroups = gstarts.size
    term_new = np.empty(ngroups, dtype=bool)
    term_new[0] = True
    term_new[1:] = gterm[1:] != gterm[:-1]
    tstarts = np.flatnonzero(term_new)              # group-index of term start
    tends = np.append(tstarts[1:], ngroups)
    df_per_term = (tends - tstarts).astype(np.int64)
    ttf_per_term = np.add.reduceat(tfs, tstarts)
    term_ids = gterm[tstarts]

    # ---- block layout -----------------------------------------------------
    nb = (df_per_term + BLOCK_SIZE - 1) // BLOCK_SIZE
    nblocks = int(nb.sum())
    first = np.repeat(tstarts, nb)
    within = np.arange(nblocks, dtype=np.int64) - np.repeat(np.cumsum(nb) - nb, nb)
    bstarts = first + within * BLOCK_SIZE           # group-index
    bends = np.minimum(bstarts + BLOCK_SIZE, np.repeat(tends, nb))
    bnd = (bends - bstarts).astype(np.int64)

    block_term = gterm[bstarts]
    block_id = within
    first_doc = gdoc[bstarts]
    last_doc = gdoc[bends - 1]
    block_max_tf = np.maximum.reduceat(tfs, bstarts)
    block_min_fnid = np.minimum.reduceat(gfn, bstarts)

    # ---- encode streams (one vectorized pass each, split per block) ------
    # docs: delta within block, first doc absolute (base -1 -> gap doc+1)
    dgaps = np.empty(ngroups, dtype=np.int64)
    dgaps[0] = gdoc[0] + 1
    dgaps[1:] = gdoc[1:] - gdoc[:-1]
    dgaps[bstarts] = gdoc[bstarts] + 1
    docs_bytes = varbyte_encode_split(dgaps.astype(np.uint64), bstarts)

    # tfs: minus-one encoding
    tf_bytes = varbyte_encode_split((tfs - 1).astype(np.uint64), bstarts)

    # fieldnorm ids: raw u8 per doc in block
    gfn_u8 = gfn.astype(np.uint8).tobytes()
    fn_bytes = [gfn_u8[s:e] for s, e in zip(bstarts, bends)]

    if store_positions:
        # positions: delta within each (term,doc) group, absolute at group
        # start; split at block boundaries in token space
        pgaps = np.empty(total, dtype=np.int64)
        pgaps[0] = p[0]
        pgaps[1:] = p[1:] - p[:-1]
        pgaps[gstarts] = p[gstarts]
        tok_bstarts = gstarts[bstarts]
        pos_bytes = varbyte_encode_split(pgaps.astype(np.uint64), tok_bstarts)
    else:
        pos_bytes = [None] * nblocks

    p_rows = pd.DataFrame({
        "kind": "p",
        "segment_id": segment_id,
        "term": uniques[block_term],
        "block_id": block_id.astype(np.int64),
        "first_doc": first_doc.astype(np.int64),
        "last_doc": last_doc.astype(np.int64),
        "ndocs": bnd,
        "docs": docs_bytes,
        "tfs": tf_bytes,
        "fnids": fn_bytes,
        "positions": pos_bytes,
        "block_max_tf": block_max_tf.astype(np.int64),
        "block_min_fnid": block_min_fnid.astype(np.int64),
    })

    t_rows = pd.DataFrame({
        "kind": "t",
        "segment_id": segment_id,
        "term": uniques[term_ids],
        "df": df_per_term,
        "ttf": ttf_per_term.astype(np.int64),
    })

    # union-of-fields term stats ("u:{term}") — the AllBody-field df the
    # reference's BM25F IDF reads (ranking/bm25f.rs:38-50): df = docs
    # holding the term in ANY scored field, ttf = occurrences across all
    # of them. Stats only — no posting blocks.
    u_rows = None
    if efields:
        uparts_t = [flat] if flat.size else []
        uparts_d = [text_docs] if flat.size else []
        for _, eflat, elens, _ in efields:
            if eflat.size:
                uparts_t.append(eflat)
                uparts_d.append(np.repeat(doc_ids, elens))
        if uparts_t:
            u_terms = np.concatenate(uparts_t)
            u_docs = np.concatenate(uparts_d)
            ucodes, uuniq = pd.factorize(u_terms, sort=True)
            uorder = np.lexsort((u_docs, ucodes))
            cu, du = ucodes[uorder], u_docs[uorder]
            npair = np.empty(cu.size, dtype=bool)
            npair[0] = True
            npair[1:] = (cu[1:] != cu[:-1]) | (du[1:] != du[:-1])
            pstart = np.flatnonzero(npair)
            pterm = cu[pstart]
            ptf = np.diff(np.append(pstart, cu.size)).astype(np.int64)
            tnew = np.empty(pterm.size, dtype=bool)
            tnew[0] = True
            tnew[1:] = pterm[1:] != pterm[:-1]
            tstart = np.flatnonzero(tnew)
            upre = np.full(tstart.size, "u:", dtype=object)
            u_rows = pd.DataFrame({
                "kind": "t",
                "segment_id": segment_id,
                "term": upre + np.asarray(uuniq, dtype=object)[
                    pterm[tstart]],
                "df": np.diff(np.append(tstart, pterm.size)
                              ).astype(np.int64),
                "ttf": np.add.reduceat(ptf, tstart).astype(np.int64),
            })

    posting_bytes = int(sum(len(b) for b in docs_bytes)
                        + sum(len(b) for b in tf_bytes)
                        + sum(len(b) for b in fn_bytes)
                        + sum(len(b) for b in pos_bytes if b is not None))
    g_rows = pd.DataFrame([{
        "kind": "g", "segment_id": segment_id, "num_docs": n,
        "num_terms": int(df_per_term.size), "total_tokens": int(lens.sum()),
        "posting_bytes": posting_bytes,
    }])

    parts = [p_rows, t_rows, d_rows, g_rows]
    if u_rows is not None:
        parts.insert(2, u_rows)
    out = pd.concat(parts, ignore_index=True)
    return out.reindex(columns=_COLS)
