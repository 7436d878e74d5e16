"""FIXTURES.md §5: BM25 rank-identity vs a naive pandas oracle.

Zipf-ish synthetic corpus with a deliberate heavy hitter ('the'),
salting forced via a tiny salt_max_postings, block size forced small so
multi-block terms and block-max pruning paths are exercised. Asserts
top-k doc keys AND scores are rank-identical between engine and oracle
for single-term / AND / NOT / phrase queries at k=10 and k=50.
"""

import math
import os

import pytest

from aspublic_spark.functions.tokenizer import tokenize
from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query.engine import SearchEngine
from aspublic_spark.tables import synth_transcripts

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_transcripts(spark, 300, seed=7).toPandas()


@pytest.fixture(scope="module")
def engine(spark, workdir, corpus):
    idx = os.path.join(workdir, "oracle_idx")
    df = synth_transcripts(spark, 300, seed=7)
    IndexBuilder(
        spark, idx, n_slices=3, block_size=16, salt_max_postings=40
    ).build(df)
    # prune_min_postings=0: rank identity must hold WITH pruning active
    return SearchEngine(spark, idx, prune_min_postings=0)


def _oracle(pdf, and_terms=(), not_terms=(), phrase=(), k=10):
    docs = []
    toks_all = pdf["text"].map(tokenize)
    N = len(pdf)
    avgdl = toks_all.map(len).mean()
    pos_terms = sorted(set(and_terms) | set(phrase))
    dfreq = {t: int(toks_all.map(lambda ts: t in ts).sum()) for t in pos_terms}
    for (_, row), toks in zip(pdf.iterrows(), toks_all):
        if any(t not in toks for t in and_terms):
            continue
        if any(t in toks for t in not_terms):
            continue
        if phrase:
            npos = [i for i, t in enumerate(toks) if t == phrase[0]]
            ok = any(
                all(i + j < len(toks) and toks[i + j] == phrase[j] for j in range(len(phrase)))
                for i in npos
            )
            if not ok:
                continue
        dl = len(toks)
        score = 0.0
        for t in pos_terms:
            tf = toks.count(t)
            if tf:
                idf = math.log((N - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1)
                score += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
        if score > 0:
            docs.append((row["conv_id"], row["turn_idx"], score))
    docs.sort(key=lambda x: (-x[2], x[0], x[1]))
    return docs[:k]


CASES = [
    dict(q="zebra", and_terms=["zebra"]),
    dict(q="the", and_terms=["the"]),  # heavy hitter -> salted, multi-block
    dict(q="query spark", and_terms=["query", "spark"]),
    dict(q="data !the", and_terms=["data"], not_terms=["the"]),
    dict(q='"the the"', phrase=["the", "the"]),
    dict(q='"data the"', phrase=["data", "the"]),
]


@pytest.mark.parametrize("k", [10, 50])
@pytest.mark.parametrize("case", CASES, ids=[c["q"] for c in CASES])
def test_rank_identity(engine, corpus, case, k):
    got = [
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in engine.search(case["q"], k=k).df.collect()
    ]
    want = _oracle(
        corpus,
        and_terms=case.get("and_terms", ()),
        not_terms=case.get("not_terms", ()),
        phrase=case.get("phrase", ()),
        k=k,
    )
    assert [(c, t) for c, t, _ in got] == [(c, t) for c, t, _ in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-9, (g, w)


def test_salting_actually_happened(engine):
    # 'the' exceeds salt_max_postings=40 -> must appear with >1 salt
    from pyspark.sql import functions as F

    salts = (
        engine.blocks(["the"]).select("salt").distinct().count()
    )
    assert salts > 1


def test_multi_block_terms(engine):
    blocks = engine.blocks(["the"]).count()
    assert blocks > 2
