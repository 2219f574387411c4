"""RAKE keyword extraction — distributed, pure DataFrame ops.

Reference: /root/reference/crates/core/src/rake.rs (the modified RAKE
of https://doi.org/10.1002/9780470689646.ch1 — keywords from a
frequent-word SUMMARY of the text), producing the per-page keywords the
reference indexes (webpage/html/into_tantivy.rs:153-157) and the
index-level KeyPhrases the TopKeyPhrases query aggregates
(generic_query/top_key_phrases.rs:75-82 sums scores per phrase).

Per document (rake.rs:172-223), mirrored stage by stage:

1. lowercase; split into sentences on `, . ! ? \\n \\r \\t U+2026
   U+2025 U+2024` (rake.rs:31-36).
2. summary: word frequencies over non-stopword whitespace tokens;
   each sentence scores the sum of its words' frequencies (stopwords
   count 0); keep the top `summary_sentences` (16) by score, ties in
   original sentence order (Rust stable sort, rake.rs:58-110).
3. candidate phrases: within kept sentences, maximal runs of
   consecutive non-stopword words, kept when 1 < len <= `max_words`
   (single words are dropped — rake.rs:42-70; the reference's
   `,`/`.` strip inside phrases() is a no-op since the sentence split
   already consumed those characters).
4. over all candidate phrases: word_frequency += 1 and word_degree +=
   (phrase_len - 1) per word occurrence (rake.rs:188-199).
5. phrase score = mean over its words of degree(w)/freq(w); duplicate
   phrases collapse (HashMap keyed by phrase, rake.rs:201-211).
6. keep the top `floor(distinct_phrase_words / 3)` phrases by score,
   then filter len(text) > 1 and score > 0 (rake.rs:213-222 — the
   take happens BEFORE the filters, faithfully mirrored). The
   reference's equal-score tie order is HashMap iteration order
   (nondeterministic); here ties break by phrase text ascending.

Deliberate divergence: the reference loads per-language ISO stopword
lists keyed by whatlang detection (stopwords::all()); this takes a
caller-supplied stopword set defaulting to the engine's English set
(ops.textstats.STOPWORDS).

100-TB design: every stage is a per-document window or groupBy keyed
by doc_id — Catalyst plans one hash-partition of the corpus by doc_id
reused across the windows; nothing global, no Python, no collect. The
corpus-level `top_key_phrases_rake` adds one (phrase) shuffle for the
score sum — the merge_results analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import STOPWORDS

# rake.rs:31-36 is_sent_split
_SENT_SPLIT = "[,.!?\\n\\r\\t…‥․]"


def rake_keywords(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_words: int = 5,
                  summary_sentences: int = 16,
                  stopwords: tuple[str, ...] = STOPWORDS,
                  cache: bool = True) -> DataFrame:
    """(doc_id, phrase, score): each document's RAKE keywords.

    cache=True persists the two DAG-shared frames (the tokenized
    corpus and the phrase-word table, MEMORY_AND_DISK) — the RAKE DAG
    branches over them ~6 times (summary freq, sentence scores, runs,
    stats, scores, caps), and without a materialization each branch
    re-tokenizes the corpus from the scan (measured 43 Exchanges /
    6x source reads at sf0.001; with it, branches read the cached
    token table). Entries are LRU-evicted by Spark; call
    `spark.catalog.clearCache()` to drop them eagerly."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.lower(F.col(text_col)).alias("t"))
    sents = (base
             .select("doc_id", F.posexplode(F.split("t", _SENT_SPLIT))
                     .alias("sent_idx", "sent")))
    words = (sents
             .select("doc_id", "sent_idx",
                     F.posexplode(F.split(F.trim("sent"), r"\s+"))
                     .alias("widx", "word"))
             .filter(F.col("word") != ""))
    words = words.withColumn("is_stop",
                             F.array_contains(sw, F.col("word")))
    # one explicit doc_id partitioning reused by every downstream
    # groupBy/window (all keyed by doc_id-prefixed tuples:
    # HashPartitioning(doc_id) satisfies any superset clustering)
    words = words.repartition("doc_id")
    if cache:
        from pyspark import StorageLevel

        words = words.persist(StorageLevel.MEMORY_AND_DISK)

    # ---- summary: top sentences by summed non-stopword frequency ----
    freq = (words.filter(~F.col("is_stop"))
            .groupBy("doc_id", "word")
            .agg(F.count("*").alias("f")))
    sent_scores = (words.join(freq, ["doc_id", "word"], "left")
                   .groupBy("doc_id", "sent_idx")
                   .agg(F.sum(F.coalesce(F.col("f"), F.lit(0)))
                        .alias("sscore")))
    wsel = Window.partitionBy("doc_id").orderBy(
        F.desc("sscore"), F.asc("sent_idx"))
    kept = (sent_scores
            .withColumn("rn", F.row_number().over(wsel))
            .filter(F.col("rn") <= summary_sentences)
            .select("doc_id", "sent_idx"))

    # ---- candidate phrases: runs of consecutive non-stopwords -------
    kw = words.join(kept, ["doc_id", "sent_idx"])
    wrun = (Window.partitionBy("doc_id", "sent_idx")
            .orderBy("widx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    kw = kw.withColumn(
        "phrase_id", F.sum(F.col("is_stop").cast("int")).over(wrun))
    ph_words = kw.filter(~F.col("is_stop"))
    phrases = (ph_words
               .groupBy("doc_id", "sent_idx", "phrase_id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("widx", "word"))),
                       lambda s: s.word), " ").alias("phrase"),
                   F.count("*").alias("nwords"))
               .filter((F.col("nwords") > 1)
                       & (F.col("nwords") <= max_words)))

    # ---- word degree / frequency over the candidate phrases ---------
    pw = (ph_words.join(
        phrases.select("doc_id", "sent_idx", "phrase_id", "phrase",
                       "nwords"),
        ["doc_id", "sent_idx", "phrase_id"]))
    if cache:
        from pyspark import StorageLevel

        pw = pw.persist(StorageLevel.MEMORY_AND_DISK)
    stats = (pw.groupBy("doc_id", "word")
             .agg(F.count("*").alias("wf"),
                  F.sum(F.col("nwords") - 1).alias("wd")))

    # ---- phrase scores, dedup, per-doc cap --------------------------
    scored = (pw.join(stats, ["doc_id", "word"])
              .groupBy("doc_id", "sent_idx", "phrase_id", "phrase")
              .agg(F.avg(F.col("wd").cast("double") / F.col("wf"))
                   .alias("score")))
    dedup = (scored.groupBy("doc_id", "phrase")
             .agg(F.min("score").alias("score")))
    caps = (stats.groupBy("doc_id")
            .agg((F.countDistinct("word") / 3).cast("long")
                 .alias("cap")))
    wrank = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("phrase"))
    return (dedup
            .withColumn("rn", F.row_number().over(wrank))
            .join(caps, "doc_id")
            .filter((F.col("rn") <= F.col("cap"))
                    & (F.length("phrase") > 1)
                    & (F.col("score") > 0.0))
            .select("doc_id", "phrase", "score"))


def top_key_phrases_rake(docs: DataFrame, k: int = 20,
                         **kw) -> DataFrame:
    """Corpus-level key phrases: sum of per-doc RAKE scores per phrase,
    top-k by score (the TopKeyPhrasesQuery merge,
    generic_query/top_key_phrases.rs:75-88; ties by phrase asc)."""
    return (rake_keywords(docs, **kw)
            .groupBy("phrase")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("phrase"))
            .limit(k))
