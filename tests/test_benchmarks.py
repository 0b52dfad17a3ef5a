"""Benchmark harness smoke tests (small n, CPU)."""

from memex_tpu.benchmarks.datasets import make_corpus, make_queries, oracle_topk
from memex_tpu.benchmarks.run import bench_tier


def test_oracle_matches_argsort():
    import numpy as np

    corpus = make_corpus(500, 32, kind="uniform")
    queries = make_queries(corpus, 4)
    expect = np.argsort(-(queries @ corpus.T), axis=1)[:, :5]
    got = oracle_topk(corpus, queries, 5)
    np.testing.assert_array_equal(got, expect)


def test_bench_tiers_smoke():
    corpus = make_corpus(3000, 48)
    queries = make_queries(corpus, 4)
    for tier in ["flat", "flat_int8", "ivf", "hnsw"]:
        out = bench_tier(tier, corpus, queries, k=5, repeats=1)
        assert out["recall_at_k"] >= 0.5, out
        assert out["qps"] > 0
