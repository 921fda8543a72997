"""SemDeDup (pipelines/semdedup.py) vs the sequential integer recompute,
plus keep-rule and partitioning invariants."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(ray_session):
    from ner_pytorch_ray.pipelines.semdedup import semdedup
    from tools.make_expected import semdedup_expected

    got = semdedup(SF, n_centroids=4).to_pandas()
    exp = semdedup_expected(SF, n_centroids=4).to_pandas()
    return got, exp


def test_matches_sequential(results):
    got, exp = results
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_every_vector_classified_once(results):
    got, _ = results
    assert got["vec_id"].is_unique
    assert got["keep"].dtype == bool


def test_keepers_exist_per_cluster(results):
    got, _ = results
    per = got.groupby("cluster")["keep"].sum()
    assert (per >= 1).all()  # every non-empty cluster keeps something


def test_distributed_fit_partitioning_invariant(ray_session):
    """fit='distributed' (integer-billionths partial refinement) must give
    bit-identical verdicts regardless of CPU count / batch composition —
    the integer partials are summation-order independent."""
    import ray.data

    from ner_pytorch_ray.pipelines.semdedup import semdedup

    a = semdedup(SF, n_centroids=4, fit="distributed").to_pandas()
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024  # force many tiny blocks
        b = semdedup(SF, n_centroids=4, fit="distributed").to_pandas()
    finally:
        ctx.target_max_block_size = old
    assert a.equals(b)


def test_ann_recall_counts_intersections(ray_session):
    """recall@k bookkeeping: hits == |approx ∩ exact| per method, ivf
    with enough probes beats tiny-band LSH on this fixture, and the
    denominator is q*k."""
    from ner_pytorch_ray.pipelines.similarity import (
        ann_lsh_topk,
        ann_recall,
        ivf_topk,
        ivfpq_topk,
        knn_topk,
        pq_topk,
    )

    SF = "/root/testdata/sf0.001"
    got = {
        r["method"]: (r["n_hits"], r["recall_ppm"])
        for r in ann_recall(SF, n_queries=5, k=3).take_all()
    }
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_topk(SF, n_queries=5, k=3).take_all()
    }
    for name, fn in (
        ("ann_lsh", ann_lsh_topk),
        ("ivf", ivf_topk),
        ("pq", pq_topk),
        ("ivfpq", ivfpq_topk),
    ):
        pairs = {
            (r["query_id"], r["neighbor_id"])
            for r in fn(SF, n_queries=5, k=3).take_all()
        }
        n = len(pairs & truth)
        assert got[name] == (n, 1_000_000 * n // 15)
    assert set(got) == {"ann_lsh", "ivf", "pq", "ivfpq"}
