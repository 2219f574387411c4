"""TF-IDF + Naive Bayes text classifier — the reference's
`naive_bayes.rs` pipeline (used by its safety classifier,
crates/core/src/webpage/safety_classifier.rs) re-expressed as
DataFrame operators.

Reference semantics mirrored exactly
(/root/reference/crates/core/src/naive_bayes.rs):

- Vectorizer (naive_bayes.rs:29-115): whitespace tokenization
  (`split_whitespace` — the CALLER preprocesses/lowercases),
  idf = ln(N / (1 + df)) + 1, feature value = tf * idf; transform
  drops terms outside the fitted vocabulary.
- Fit (naive_bayes.rs:197-237): per class, count(term) = sum of
  feature values over that class's docs; feature_log_prob =
  ln((count + ALPHA) / (total + ALPHA)) with ALPHA = 1 (Laplace,
  naive_bayes.rs:26); class_prior = n_class / n_docs.
- Predict (naive_bayes.rs:160-181 + 239-293): per class,
  log_prob = ln(prior) + sum over sample features of
  value * feature_log_prob[class][term], where a term UNSEEN in the
  class's training mass contributes value * 0.5
  (`unwrap_or(ALPHA / (ALPHA + ALPHA))` — naive_bayes.rs:289, a
  constant, not a log). The chosen label is the class with the
  MINIMUM log_prob (naive_bayes.rs:166-171 initializes best to
  +inf and takes `<`): seen-term contributions are negative logs
  while the 0.5 unseen default inflates non-matching classes, so the
  minimum selects the class holding the sample's feature mass — the
  two quirks are mutually consistent and pinned by the reference's
  own unit test (naive_bayes.rs:311-374), which
  tests/test_classify.py replays against this implementation.
  Ties go to the first class in sorted order (strict `<`).
- Confidence = best_log_prob / sum(all class log_probs), clamped to
  >= 0 (naive_bayes.rs:173-176).

100-TB design: fit is two token-shuffles (df + per-class mass) and
predict is one token-shuffle joined against the model tables — the
model itself is DataFrames (vocab-sized idf + |classes| x vocab
feature-log-prob), never collected to the driver; the tiny
class-prior table broadcasts. All arithmetic is f64 JVM column
expressions — no Python in any hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 1.0  # Laplace smoothing (naive_bayes.rs:26)


def _terms(text_col: str):
    """Whitespace tokens (split_whitespace analog: no empty tokens)."""
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != "")


class NaiveBayesModel:
    """Fitted pipeline: (classes, priors) + idf and feature-log-prob
    DataFrames. Save/load round-trips through parquet (the bincode
    persistence analog, naive_bayes.rs Pipeline derive)."""

    def __init__(self, priors: DataFrame, idf: DataFrame,
                 flp: DataFrame):
        self.priors = priors     # (label, log_prior)         — tiny
        self.idf = idf           # (term, idf)                — vocab
        self.flp = flp           # (label, term, log_prob)

    def save(self, path: str) -> None:
        self.priors.write.mode("overwrite").parquet(
            os.path.join(path, "priors"))
        self.idf.write.mode("overwrite").parquet(
            os.path.join(path, "idf"))
        self.flp.write.mode("overwrite").parquet(
            os.path.join(path, "flp"))

    @classmethod
    def load(cls, spark, path: str) -> "NaiveBayesModel":
        return cls(spark.read.parquet(os.path.join(path, "priors")),
                   spark.read.parquet(os.path.join(path, "idf")),
                   spark.read.parquet(os.path.join(path, "flp")))


def fit_nb(docs: DataFrame, label_col: str, text_col: str = "text",
           id_col: str = "doc_id") -> NaiveBayesModel:
    """Fit the TF-IDF + NB pipeline (naive_bayes.rs Pipeline::fit).

    Two shuffles over token pairs: (term) for document frequencies,
    (label, term) for per-class feature mass. Rows with a NULL label
    are ignored (un-annotated docs)."""
    docs = docs.filter(F.col(label_col).isNotNull())
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("fit_nb: empty training set")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        F.explode(_terms(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "label", "term").agg(
        F.count("*").cast("double").alias("tf"))
    # document frequencies -> idf = ln(N / (1 + df)) + 1
    idf = (tf.groupBy("term")
           .agg(F.count("*").cast("double").alias("df"))
           .select("term",
                   (F.log(F.lit(float(n_docs)) / (F.lit(1.0)
                                                  + F.col("df")))
                    + F.lit(1.0)).alias("idf")))
    val = (tf.join(idf, "term")
           .select("doc_id", "label", "term",
                   (F.col("tf") * F.col("idf")).alias("value")))
    totals = val.groupBy("label").agg(F.sum("value").alias("total"))
    flp = (val.groupBy("label", "term")
           .agg(F.sum("value").alias("cnt"))
           .join(totals, "label")
           .select("label", "term",
                   F.log((F.col("cnt") + F.lit(ALPHA))
                         / (F.col("total") + F.lit(ALPHA)))
                   .alias("log_prob")))
    priors = (docs.groupBy(F.col(label_col).alias("label"))
              .agg(F.count("*").alias("n"))
              .select("label",
                      F.log(F.col("n") / F.lit(float(n_docs)))
                      .alias("log_prior")))
    return NaiveBayesModel(priors, idf, flp)


def predict_nb(model: NaiveBayesModel, docs: DataFrame,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, label, confidence) — the reference's Prediction per
    input doc (naive_bayes.rs:160-181): min-log-prob class selection
    with the 0.5 unseen-term default, confidence = best / sum
    clamped >= 0. A doc with no in-vocabulary terms scores each class
    at its log prior alone (empty feature vector)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(_terms(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf"))
    val = (tf.join(model.idf, "term")  # transform: vocab terms only
           .select("doc_id", "term",
                   (F.col("tf") * F.col("idf")).alias("value")))
    # every (doc, class) pair scores — the class table is tiny
    base = (docs.select(F.col(id_col).alias("doc_id"))
            .crossJoin(F.broadcast(model.priors)))
    contrib = (val.crossJoin(
        F.broadcast(model.priors.select("label")))
        .join(model.flp, ["label", "term"], "left")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("value")
                   * F.coalesce(F.col("log_prob"),
                                F.lit(ALPHA / (ALPHA + ALPHA))))
             .alias("mass")))
    scored = (base.join(contrib, ["doc_id", "label"], "left")
              .select("doc_id", "label",
                      (F.col("log_prior")
                       + F.coalesce(F.col("mass"), F.lit(0.0)))
                      .alias("log_prob")))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    ranked = (scored
              .withColumn("s", F.sum("log_prob").over(w))
              .withColumn("rn", F.row_number().over(
                  w.orderBy(F.asc("log_prob"), F.asc("label")))))
    return (ranked.filter(F.col("rn") == 1)
            .select("doc_id", "label",
                    F.greatest(F.col("log_prob") / F.col("s"),
                               F.lit(0.0)).alias("confidence")))
