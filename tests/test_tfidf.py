"""TF-IDF top-terms vs a hand-computed oracle (smooth idf, tie-break)."""

import math

from entity_linking_spark.operators.tfidf import tfidf_top_terms


def test_tfidf_hand_computed(spark):
    docs = [
        (1, "apple apple banana"),
        (2, "apple cherry"),
        (3, "banana banana banana date"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=2, min_term_chars=2)
    got = {(r["id"], r["rank"]): (r["term"], r["tf"], r["df"], r["tfidf"]) for r in out.collect()}

    def idf(df_):
        return math.log((3 + 1.0) / (df_ + 1.0)) + 1.0

    # doc 1: apple tf2 df2 → 2*idf(2); banana tf1 df2 → idf(2) → apple first
    assert got[(1, 1)][0] == "apple" and abs(got[(1, 1)][3] - 2 * idf(2)) < 1e-12
    assert got[(1, 2)][0] == "banana"
    # doc 2: apple tf1 df2 vs cherry tf1 df1 → cherry (rarer) wins
    assert got[(2, 1)][0] == "cherry" and abs(got[(2, 1)][3] - idf(1)) < 1e-12
    assert got[(2, 2)][0] == "apple"
    # doc 3: banana tf3 dominates; date second
    assert got[(3, 1)][0] == "banana" and abs(got[(3, 1)][3] - 3 * idf(2)) < 1e-12
    assert got[(3, 2)][0] == "date"


def test_tfidf_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame([(1, "zed abc")], "doc_id long, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    ranked = sorted((r["rank"], r["term"]) for r in out)
    # identical tf/df → identical tfidf → lexicographic term order
    assert ranked == [(1, "abc"), (2, "zed")]


def test_unigram_logprob_closed_form(spark):
    """Hand-computable corpus: 4 'a', 2 'b', 2 'c' tokens (total 8).
    Scores are mean ln(c/8) per doc; empty docs are absent."""
    import math

    from entity_linking_spark.operators.tfidf import unigram_logprob_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "a c"), (4, "")],
        "id long, text string",
    )
    out = {r["id"]: r for r in
           unigram_logprob_scores(docs, "id", "text").collect()}
    assert set(out) == {1, 2, 3}
    la, lb = math.log(4 / 8), math.log(2 / 8)
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == round((2 * la + lb) / 3, 4)
    assert out[2]["avg_logprob"] == round((la + 2 * lb) / 3, 4)
    assert out[3]["avg_logprob"] == round((la + lb) / 2, 4)
    # common-word docs score higher than rare-word docs
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
