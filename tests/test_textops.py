"""Hand-computed goldens for the text-pipeline operators (beyond the
DuckDB oracle gate, which checks engine equivalence — these pin the
intended semantics)."""

from pyspark.sql import functions as F  # noqa: F401


def test_repetition_stats_golden(spark):
    from smart_crawler_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 words, all distinct; bigrams: "a b","b c","c d" distinct
            (1, "a b c d"),
            # "spam spam spam spam": words 4/1 distinct -> 0.75;
            # bigrams 3 total 1 distinct -> 2/3; trigrams 2/1 -> 0.5
            (2, "spam spam spam spam"),
            # short doc: 2 words, no trigrams -> trigram frac 0
            (3, "ab ab"),
            # empty after tokenization
            (4, "!!!"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == 0.0
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[2]["dup_word_frac"] == 0.75
    assert round(got[2]["dup_bigram_frac"], 6) == round(2 / 3, 6)
    assert got[2]["dup_trigram_frac"] == 0.5
    assert got[3]["n_words"] == 2
    assert got[3]["dup_word_frac"] == 0.5
    assert got[3]["dup_bigram_frac"] == 0.0  # one bigram, distinct
    assert got[3]["dup_trigram_frac"] == 0.0  # below n: empty, not NaN
    assert got[4]["n_words"] == 0
    assert got[4]["dup_word_frac"] == 0.0
