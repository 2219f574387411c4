"""Deterministic synthetic transcripts table (FIXTURES.md §1/§3).

Schema per BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp

Content patterns (FIXTURES.md §3):
- Zipfian vocabulary (~20k words) so hot terms exercise salting/WAND.
- The reference test sentence "this is the best example website ever"
  (cf. /root/reference/crates/core/src/inverted_index/mod.rs:314) planted
  into ~1% of turns with varied repetition (varied tf).
- Special-char turns: C++, example.com, path/test, æble café, 漢, ダ.
- Duplicate texts across different (conv_id, turn_idx).
- Length spread 1..~3000 tokens (crosses fieldnorm buckets, forces
  multi-block postings).

All generation is numpy-vectorized and seeded — same (n_turns, seed)
always yields the identical table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PLANTED = "this is the best example website ever"
SPECIAL_TEXTS = [
    "a C++ blog post about example.com and path/test",
    "unicode test æble café smells nice",
    "test 漢.com and katakana ダ.com",
    "numbers 123 33 and the test string",
    "single",
    "this is a query about the best website",   # q05 phrase+term hits
    "this is a query that mentions a test",
]
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "bash", "search", "python"])

VOCAB_SIZE = 20_000


def _vocab(rng: np.random.Generator) -> np.ndarray:
    """Deterministic word list: pronounceable-ish lowercase words."""
    syll = np.array([
        "ba", "co", "di", "fu", "ge", "ha", "ki", "lo", "mu", "ne",
        "po", "qua", "ri", "so", "tu", "ve", "wi", "xo", "yu", "za",
        "tra", "ser", "min", "dor", "lex", "pan", "vor", "keth", "sul", "ram",
    ])
    n_syll = rng.integers(2, 5, size=VOCAB_SIZE)
    picks = rng.integers(0, len(syll), size=(VOCAB_SIZE, 4))
    words = []
    seen = set()
    for i in range(VOCAB_SIZE):
        w = "".join(syll[picks[i, : n_syll[i]]])
        if w in seen:
            w = f"{w}{i}"
        seen.add(w)
        words.append(w)
    # put a few query-set anchor words at known Zipf ranks
    words[0] = "the"        # hot term (Zipf rank 1) for WAND pruning tests
    words[5] = "test"
    words[12] = "example"
    words[13] = "website"
    words[VOCAB_SIZE - 1] = "xylophonequark"  # df≈1 rare-tail term
    return np.array(words, dtype=object)


def generate_transcripts(n_turns: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    # conversations of 1..40 turns until we reach n_turns
    avg = 20.5
    n_conv = max(1, int(n_turns / avg) + 2)
    sizes = rng.integers(1, 41, size=n_conv)
    total = int(sizes.cumsum()[-1])
    while total < n_turns:
        extra = rng.integers(1, 41, size=max(2, n_conv // 10))
        sizes = np.concatenate([sizes, extra])
        total = int(sizes.sum())
    cum = np.cumsum(sizes)
    cut = int(np.searchsorted(cum, n_turns)) + 1
    sizes = sizes[:cut]
    sizes[-1] -= int(cum[cut - 1] - n_turns) if cum[cut - 1] > n_turns else 0
    sizes = sizes[sizes > 0]
    n = int(sizes.sum())

    conv_idx = np.repeat(np.arange(len(sizes)), sizes)
    turn_idx = (np.arange(n) - np.repeat(np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes)).astype(np.int32)
    conv_id = pd.array([f"conv-{i:08d}" for i in conv_idx], dtype="string")

    # token lengths: lognormal-ish 1..~120, plus a seeded long tail to ~3000
    lens = np.clip(rng.lognormal(2.7, 0.8, size=n).astype(np.int64), 1, 120)
    long_docs = rng.choice(n, size=max(1, n // 500), replace=False)
    lens[long_docs] = rng.integers(200, 3001, size=long_docs.size)

    # Zipfian token sampling via inverse CDF
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    pmf = 1.0 / ranks
    cdf = np.cumsum(pmf / pmf.sum())
    total_tokens = int(lens.sum())
    tok_ids = np.searchsorted(cdf, rng.random(total_tokens), side="right")
    words = vocab[tok_ids]

    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    joined = [" ".join(words[s:s + l]) for s, l in zip(starts, lens)]
    texts = pd.array(joined, dtype=object)

    # plant the reference sentence into ~1% of turns with varied tf
    planted_rows = rng.choice(n, size=max(1, n // 100), replace=False)
    reps = rng.integers(1, 4, size=planted_rows.size)
    for r, rep in zip(planted_rows, reps):
        texts[r] = " ".join([PLANTED] * int(rep)) + " " + texts[r]

    # special-char docs at deterministic rows
    for j, st in enumerate(SPECIAL_TEXTS):
        texts[(j * 997 + 17) % n] = st

    # duplicates: ~0.5% rows copy another row's text
    dup_dst = rng.choice(n, size=max(1, n // 200), replace=False)
    dup_src = rng.integers(0, n, size=dup_dst.size)
    for d, s in zip(dup_dst, dup_src):
        texts[d] = texts[s]

    roles = ROLES[np.arange(n) % 4]
    tools = TOOLS[rng.integers(0, 4, size=n)]
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        conv_idx * 3600 + turn_idx.astype(np.int64) * 13, unit="s"
    )

    return pd.DataFrame(
        {
            "conv_id": np.asarray(conv_id, dtype=object),
            "turn_idx": turn_idx,
            "role": roles,
            "text": np.asarray(texts, dtype=object),
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_df(spark, n_turns: int, seed: int = 42, partitions: int | None = None):
    """Synthetic transcripts as a Spark DataFrame (Arrow-converted)."""
    from pyspark.sql import types as T

    pdf = generate_transcripts(n_turns, seed)
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    df = spark.createDataFrame(pdf, schema=schema)
    if partitions:
        df = df.repartition(partitions)
    return df
