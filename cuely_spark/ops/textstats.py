"""Text analysis operators: token stats, quality score, language-ID
heuristic, document fingerprinting. All JVM-side column expressions
(whole-stage-codegen friendly) so they run at scan speed at 100 TB —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import h60_spark

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# tiny per-language stopword marker sets for the n-gram/marker heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "es": ("el", "los", "de", "es"),
    "fr": ("le", "les", "et", "est"),
}


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len)."""
    from . import spread

    docs = spread(docs, id_col)
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(toks), 6).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, stopword_ratio, punct_ratio, quality): a deterministic
    length/punct/stopword blend in [0,1] — the classic heuristic
    pre-filter of web-scale training pipelines. Input spread across
    task slots first (the regex/token scans are the cost — a single-
    file read would otherwise run them on one core)."""
    from . import spread

    docs = spread(docs, id_col)
    toks = _tokens(text_col)
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    stop_ratio = sw.cast("double") / n
    punct_ratio = punct.cast("double") / F.length(F.col(text_col))
    # length gates the whole score (a 3-token doc can't be high quality
    # no matter how clean); stopword/punct penalties split the rest
    len_score = F.least(n.cast("double") / 64.0, F.lit(1.0))
    quality = len_score * (
        0.6 * (1.0 - F.least(stop_ratio * 2.0, F.lit(1.0)))
        + 0.4 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred): marker-token hit-count heuristic; ties break
    alphabetically, no hits -> 'und'."""
    from . import spread

    docs = spread(docs, id_col)
    toks = _tokens(text_col)
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*markers)))
        .alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select(F.col(id_col).alias("doc_id"), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when((F.col(f"score_{lang}") == best) & (best > 0),
                      lang).otherwise(pred)
    return scored.select("doc_id", pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """(doc_id, fingerprint): min k-gram shingle hash — a winnowing-style
    content fingerprint stable under local edits outside the minimal
    window (reference analog: crates/core/src/simhash.rs usage for
    near-dup collapse)."""
    from . import spread

    docs = spread(docs, id_col)
    toks = _tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.when(n >= k, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(shingles).alias("shingle"))
    return (sh.groupBy("doc_id")
            .agg(F.min(h60_spark(F.col("shingle"))).alias("fingerprint")))
