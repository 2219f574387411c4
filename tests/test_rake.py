"""RAKE keyword extraction (rake.rs analog): the brute model below
replays the reference algorithm in plain Python (summary by frequent
words, stopword-run phrase candidates, degree/freq scoring, the
distinct-words/3 cap applied before the final filters); the DataFrame
implementation must agree per (doc, phrase, score)."""
import math
import re

import numpy as np
import pandas as pd
import pytest

from cuely_spark.ops.rake import rake_keywords, top_key_phrases_rake

SW = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

_SPLIT = re.compile(r"[,.!?\n\r\t…‥․]")


def brute_rake(text: str, max_words=5, summary_sentences=16,
               stopwords=SW):
    text = text.lower()
    sents = [s for s in _SPLIT.split(text)]
    # summary (rake.rs:74-110)
    freq: dict[str, int] = {}
    for s in sents:
        for w in s.split():
            if w not in stopwords:
                freq[w] = freq.get(w, 0) + 1
    scored = []
    for i, s in enumerate(sents):
        ws = s.split()
        if not ws:
            continue
        scored.append((i, sum(freq.get(w, 0) for w in ws)))
    scored.sort(key=lambda x: -x[1])  # stable: ties keep sent order
    kept = [sents[i] for i, _ in scored[:summary_sentences]]
    # candidate phrases (rake.rs:42-70)
    phrases = []
    for s in kept:
        run: list[str] = []
        for w in s.split() + ["the"]:  # sentinel stopword flushes
            if w in stopwords:
                if 1 < len(run) <= max_words:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
    # degree / frequency (rake.rs:188-199)
    wf: dict[str, float] = {}
    wd: dict[str, float] = {}
    for p in phrases:
        for w in p:
            wf[w] = wf.get(w, 0.0) + 1.0
            wd[w] = wd.get(w, 0.0) + len(p) - 1.0
    # scores, dedup (rake.rs:201-211)
    kws = {}
    for p in phrases:
        kws[p] = sum(wd[w] / wf[w] for w in p) / len(p)
    cap = len(wd) // 3
    ranked = sorted(kws.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    return {(" ".join(p)): s for p, s in ranked
            if len(" ".join(p)) > 1 and s > 0.0}


def _texts(seed, n):
    rng = np.random.default_rng(seed)
    content = ["merge", "table", "window", "scan", "sort", "key",
               "dup", "spark", "batch", "stream"]
    toks = list(content) + list(SW) + [",", "."]
    out = []
    for _ in range(n):
        words = []
        for _ in range(int(rng.integers(10, 60))):
            t = toks[int(rng.integers(len(toks)))]
            words.append(t)
        out.append(" ".join(words))
    return out


def test_parity_vs_brute(spark):
    texts = _texts(13, 25)
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = rake_keywords(spark.createDataFrame(pdf)).collect()
    got_by_doc: dict[int, dict[str, float]] = {}
    for r in got:
        got_by_doc.setdefault(r["doc_id"], {})[r["phrase"]] = r["score"]
    for i, text in enumerate(texts):
        exp = brute_rake(text)
        g = got_by_doc.get(i, {})
        assert set(g) == set(exp), (
            f"doc {i}: {sorted(g)} != {sorted(exp)}\ntext={text!r}")
        for p, s in exp.items():
            assert math.isclose(g[p], s, rel_tol=1e-9), (i, p)


def test_summary_truncation(spark):
    """A document with >16 sentences: only the 16 most frequent-word
    sentences contribute candidate phrases."""
    rare = "zebra quark " * 2
    common = "merge table scan , " * 3
    text = ". ".join([common] * 16 + [rare])
    pdf = pd.DataFrame({"doc_id": [0], "text": [text]})
    got = {r["phrase"] for r in
           rake_keywords(spark.createDataFrame(pdf)).collect()}
    exp = set(brute_rake(text))
    assert got == exp
    assert not any("zebra" in p for p in got)


def test_single_words_dropped(spark):
    # single non-stopword runs are never keywords (len > 1 required)
    pdf = pd.DataFrame({"doc_id": [0],
                        "text": ["merge the scan table of dup"]})
    got = rake_keywords(spark.createDataFrame(pdf)).collect()
    exp = brute_rake("merge the scan table of dup")
    assert {r["phrase"] for r in got} == set(exp)
    assert all(len(r["phrase"].split()) > 1 for r in got)


def test_top_key_phrases_rake(spark):
    texts = _texts(29, 12)
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = top_key_phrases_rake(spark.createDataFrame(pdf),
                               k=5).collect()
    agg: dict[str, float] = {}
    for t in texts:
        for p, s in brute_rake(t).items():
            agg[p] = agg.get(p, 0.0) + s
    exp = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["phrase"], pytest.approx(r["score"], rel=1e-9))
            for r in got] == exp
