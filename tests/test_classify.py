"""TF-IDF + Naive Bayes classifier (naive_bayes.rs pipeline analog).

The brute-force model below replays the reference's exact arithmetic
(idf = ln(N/(1+df))+1, per-class mass Laplace log-probs, the 0.5
unseen-term default, MIN-log-prob class selection, confidence =
best/sum clamped >= 0 — naive_bayes.rs:26,160-181,239-293) in plain
Python; the Spark implementation must agree on every doc.
"""
import math

import numpy as np
import pandas as pd
import pytest

from cuely_spark.ops.classify import NaiveBayesModel, fit_nb, predict_nb


def brute_nb(train: list[tuple[str, str]], tests: list[str]):
    """(label, confidence) per test doc — reference arithmetic."""
    n = len(train)
    df: dict[str, int] = {}
    for text, _ in train:
        for t in set(text.split()):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log(n / (1 + d)) + 1.0 for t, d in df.items()}
    classes = sorted({lab for _, lab in train})
    prior = {c: sum(1 for _, l in train if l == c) / n for c in classes}
    counts = {c: {} for c in classes}
    totals = {c: 0.0 for c in classes}
    for text, lab in train:
        tf: dict[str, int] = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        for t, f in tf.items():
            v = f * idf[t]
            counts[lab][t] = counts[lab].get(t, 0.0) + v
            totals[lab] += v
    flp = {c: {t: math.log((v + 1.0) / (totals[c] + 1.0))
               for t, v in counts[c].items()} for c in classes}
    out = []
    for text in tests:
        tf = {}
        for t in text.split():
            if t in idf:
                tf[t] = tf.get(t, 0) + 1
        feats = {t: f * idf[t] for t, f in tf.items()}
        lps = []
        for c in classes:
            lp = math.log(prior[c])
            for t, v in feats.items():
                lp += v * flp[c].get(t, 0.5)
            lps.append(lp)
        best_i = min(range(len(classes)), key=lambda i: (lps[i], i))
        s = sum(lps)
        out.append((classes[best_i], max(lps[best_i] / s, 0.0)))
    return out


def _run(spark, train_rows, test_rows):
    train = spark.createDataFrame(
        pd.DataFrame(train_rows, columns=["doc_id", "text", "label"]))
    test = spark.createDataFrame(
        pd.DataFrame(test_rows, columns=["doc_id", "text"]))
    model = fit_nb(train, "label")
    res = predict_nb(model, test).orderBy("doc_id").collect()
    return [(r["label"], r["confidence"]) for r in res]


def test_reference_shape(spark):
    """The reference unit test's structure (naive_bayes.rs:311-374):
    5 docs sharing a class-exclusive term each side; the exclusive
    term alone classifies into its class."""
    train = [(i, "t0 t1", "ham") for i in range(5)] + \
            [(5 + i, "t1 t2", "spam") for i in range(5)]
    got = _run(spark, train, [(0, "t0"), (1, "t2")])
    assert [g[0] for g in got] == ["ham", "spam"]
    exp = brute_nb([(t, l) for _, t, l in train], ["t0", "t2"])
    for (gl, gc), (el, ec) in zip(got, exp):
        assert gl == el and abs(gc - ec) < 1e-9


def test_random_parity_vs_brute(spark):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    labels = ["a", "b", "c"]
    train_rows, texts = [], []
    for i in range(60):
        lab = labels[int(rng.integers(3))]
        # class-skewed vocabulary so the task is non-degenerate
        lo = labels.index(lab) * 4
        toks = rng.choice(vocab[lo:lo + 6 if lo + 6 <= 12 else 12]
                          + vocab[:2], size=int(rng.integers(2, 8)))
        train_rows.append((i, " ".join(toks), lab))
    test_rows = []
    for i in range(30):
        toks = rng.choice(vocab + ["zzz"], size=int(rng.integers(1, 7)))
        test_rows.append((i, " ".join(toks)))
        texts.append(" ".join(toks))
    got = _run(spark, train_rows, test_rows)
    exp = brute_nb([(t, l) for _, t, l in train_rows], texts)
    for i, ((gl, gc), (el, ec)) in enumerate(zip(got, exp)):
        assert gl == el, f"doc {i}: {gl} != {el}"
        assert abs(gc - ec) < 1e-9, f"doc {i}"


def test_empty_and_oov_doc(spark):
    """No in-vocab terms -> each class scores its log prior alone;
    min log prior = rarest class, ties to the first sorted label."""
    train = [(0, "x y", "a"), (1, "x y", "a"), (2, "y z", "b")]
    got = _run(spark, train, [(0, "unseen words"), (1, "   ")])
    exp = brute_nb([(t, l) for _, t, l in train],
                   ["unseen words", ""])
    assert got == [(e[0], pytest.approx(e[1], abs=1e-9)) for e in exp]
    # prior(a)=2/3, prior(b)=1/3 -> ln smaller (more negative) for b
    assert got[0][0] == "b"


def test_null_labels_ignored(spark):
    train = pd.DataFrame(
        [(0, "x y", "a"), (1, "x z", None), (2, "y z", "b")],
        columns=["doc_id", "text", "label"])
    model = fit_nb(spark.createDataFrame(train), "label")
    labels = {r["label"] for r in model.priors.collect()}
    assert labels == {"a", "b"}


def test_save_load_roundtrip(spark, tmp_path):
    train = [(i, "t0 t1", "ham") for i in range(5)] + \
            [(5 + i, "t1 t2", "spam") for i in range(5)]
    tdf = spark.createDataFrame(
        pd.DataFrame(train, columns=["doc_id", "text", "label"]))
    model = fit_nb(tdf, "label")
    model.save(str(tmp_path / "nb"))
    loaded = NaiveBayesModel.load(spark, str(tmp_path / "nb"))
    test = spark.createDataFrame(
        pd.DataFrame([(0, "t0"), (1, "t2")],
                     columns=["doc_id", "text"]))
    a = sorted(map(tuple, predict_nb(model, test).collect()))
    b = sorted(map(tuple, predict_nb(loaded, test).collect()))
    assert a == b


def test_empty_train_raises(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, label string")
    with pytest.raises(ValueError, match="empty training set"):
        fit_nb(empty, "label")
