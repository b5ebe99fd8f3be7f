"""Randomized BM25 rank-identity: seeded random mini-corpora and queries,
engine (direct pipeline) vs the independent pandas oracle. The reference's
golden-value testing philosophy (src/test.py) extended with fuzz coverage."""

from __future__ import annotations

import random

import pytest

from tests.oracle import bm25_topk_py

WORDS = [
    "alpha", "beta", "gamma", "delta", "omega", "spark", "index", "merge",
    "scan", "join", "the", "of", "camelCaseFoo", "snake_case_bar", "x1", "y2",
]


def _mk_corpus(rng: random.Random, n_docs: int) -> list[tuple[int, str]]:
    docs = []
    for i in range(n_docs):
        ln = rng.randint(0, 30)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(ln))))
    return docs


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_bm25_fuzz_rank_identity(spark, seed):
    from geocoderpl_spark.operators.topk import bm25_topk_direct

    rng = random.Random(seed)
    docs = _mk_corpus(rng, rng.randint(5, 40))
    queries = []
    for qid in range(6):
        n_terms = rng.randint(1, 4)
        qtext = " ".join(rng.choice(WORDS + ["unknownzzz"]) for _ in range(n_terms))
        queries.append((qid, qtext, rng.choice([1, 3, 10, 1000])))

    docs_df = spark.createDataFrame(docs, "doc_id long, text string")
    q_df = spark.createDataFrame(queries, "query_id long, query_text string, k int")
    got = bm25_topk_direct(docs_df, q_df).toPandas()

    corpus = dict(docs)
    for qid, qtext, k in queries:
        expected = bm25_topk_py(corpus, qtext, k)
        sub = got[got.query_id == qid].sort_values("rank")
        assert list(sub.doc_id) == [d for d, _ in expected], (seed, qid, qtext)
        for s_got, (_, s_exp) in zip(sub.score, expected):
            assert abs(s_got - s_exp) <= 1e-6
