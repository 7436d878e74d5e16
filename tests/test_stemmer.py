"""Porter stemmer + Postgres-style 'english' analyzer (SURVEY T2).

Golden pairs traced through the classic Porter (1980) rules; the
end-to-end test builds an index with analyzer='english' and checks the
to_tsvector behaviors the reference's Postgres backend exhibits:
morphological match (running ~ runs ~ run) and stopword drop.
"""

import os

import pytest

from aspublic_spark.functions.stemmer import (
    STOPWORDS_TSVECTOR_EN,
    porter_stem,
    tokenize_english,
)

PAIRS = [
    # step 1a/1b/1c
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("hopping", "hop"),
    ("sized", "size"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    # step 2-4 chains
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("electriciti", "electr"),
    ("hopeful", "hope"), ("goodness", "good"), ("formaliti", "formal"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("effective", "effect"),
    # step 5
    ("probate", "probat"), ("rate", "rate"),
    ("controlling", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", PAIRS)
def test_porter_golden(word, stem):
    assert porter_stem(word) == stem


def test_short_words_untouched():
    assert porter_stem("as") == "as" and porter_stem("is") == "is"


def test_tokenize_english_drops_stopwords_and_stems():
    out = tokenize_english("The foxes were running through the STREETS")
    assert out == ["fox", "run", "street"]
    assert "the" in STOPWORDS_TSVECTOR_EN and "were" in STOPWORDS_TSVECTOR_EN


def test_english_analyzer_index_end_to_end(spark, workdir):
    from pyspark.sql import functions as F

    from aspublic_spark.index.build import IndexBuilder
    from aspublic_spark.query.engine import SearchEngine

    rows = [
        ("c1", 0, "the dogs were running fast", 1700000000),
        ("c1", 1, "a dog runs every day", 1700000001),
        ("c1", 2, "cats sleep all day", 1700000002),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, e long"
    ).withColumn("ts", F.timestamp_seconds("e")).drop("e")
    idx = os.path.join(workdir, "english_idx")
    IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], meta_cols=["ts"],
        n_slices=2, block_size=4, analyzer="english",
    ).build(df)
    eng = SearchEngine(spark, idx)
    assert eng.analyzer == "english"
    # morphological match: query form differs from document forms
    turns = sorted(r["turn_idx"] for r in eng.search("running").df.collect())
    assert turns == [0, 1]  # running ~ runs
    assert sorted(r["turn_idx"] for r in eng.search("dog").df.collect()) == [0, 1]
    # stopwords are dropped on the QUERY side too -> empty query
    res = eng.search("the")
    assert res.parsed.is_empty()
    # phrase across a dropped stopword: 'dogs were running' indexes as
    # [dog, run, fast] and 'a dog runs every day' as [dog, run, everi,
    # day] with POST-DROP positions, so the phrase matches through the
    # stopword gap in both (to_tsvector keeps original positions; this
    # divergence is deliberate and pinned here)
    assert eng.search('"dogs running"').df.count() == 2
    assert eng.search('"dog run"').df.count() == 2
