"""Similarity search: brute-force cosine top-k vs numpy oracle; LSH path
recall on planted near-identical vectors."""

from __future__ import annotations

import numpy as np
import pytest

from bigtrees_spark.operators.similarity import brute_force_topk, lsh_neardup_pairs

DIM = 16


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, DIM)).astype(np.float32)
    # plant 10 near-dup pairs: id 100+i is a tiny perturbation of id i
    near = base[:10] + 0.01 * rng.standard_normal((10, DIM)).astype(np.float32)
    ids = list(range(40)) + [100 + i for i in range(10)]
    mat = np.vstack([base, near])
    return ids, mat


@pytest.fixture(scope="module")
def vec_df(spark, vectors):
    ids, mat = vectors
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<float>",
    ).cache()


def test_brute_force_topk_matches_numpy(spark, vec_df, vectors):
    ids, mat = vectors
    queries = vec_df.where("vec_id < 5")
    got = brute_force_topk(queries, vec_df, k=3).collect()

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    id_arr = np.array(ids)
    for q in range(5):
        qi = ids.index(q)
        order = [
            (ids[j], float(sims[qi, j]))
            for j in np.argsort(-sims[qi])
            if ids[j] != q
        ][:3]
        got_q = sorted([r for r in got if r.query_id == q], key=lambda r: r.rank)
        assert [r.neighbor_id for r in got_q] == [i for i, _ in order]
        for r, (_, s) in zip(got_q, order):
            assert abs(r.cosine - s) < 1e-5


def test_topk_excludes_self(vec_df):
    got = brute_force_topk(vec_df.where("vec_id < 3"), vec_df, k=5).collect()
    assert all(r.neighbor_id != r.query_id for r in got)


def test_lsh_neardup_finds_planted(vec_df):
    pairs = {
        (r.id_l, r.id_r)
        for r in lsh_neardup_pairs(vec_df, cosine_threshold=0.95, dim=DIM).collect()
    }
    planted = {(i, 100 + i) for i in range(10)}
    found = len(pairs & planted)
    assert found >= 9  # LSH recall on eps-perturbed pairs


def _ivf_recall(exact, approx) -> float:
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact_sets[q_] & approx_sets.get(q_, set())) for q_ in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    return hits / total


def test_ivf_topk_high_recall_vs_brute_force(spark, vec_df):
    from bigtrees_spark.operators.similarity import ivf_topk

    q = vec_df.where("vec_id < 5")
    exact = brute_force_topk(q, vec_df, k=3).collect()
    # k-means-trained quantizer (default): tight recall gate at n_probe=4/8
    approx = ivf_topk(q, vec_df, k=3, dim=DIM, n_centroids=8, n_probe=4).collect()
    assert _ivf_recall(exact, approx) >= 0.95


def test_ivf_trained_beats_untrained(spark, vec_df):
    from bigtrees_spark.operators.similarity import ivf_topk

    q = vec_df.where("vec_id < 5")
    exact = brute_force_topk(q, vec_df, k=3).collect()
    trained = ivf_topk(q, vec_df, k=3, dim=DIM, n_centroids=8, n_probe=4).collect()
    untrained = ivf_topk(
        q, vec_df, k=3, dim=DIM, n_centroids=8, n_probe=4, train=False
    ).collect()
    assert _ivf_recall(exact, trained) >= _ivf_recall(exact, untrained)


def test_fit_centroids_are_unit_norm_and_deterministic(spark, vec_df):
    import numpy as np

    from bigtrees_spark.operators.similarity import fit_ivf_centroids

    c1 = fit_ivf_centroids(vec_df, DIM, n_centroids=8, seed=7)
    c2 = fit_ivf_centroids(vec_df, DIM, n_centroids=8, seed=7)
    assert c1.shape == (8, DIM)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-5)
    assert np.array_equal(c1, c2)


def test_ivf_planted_neardups_found(spark, vec_df):
    """The planted eps-perturbed twin is ~always in the same IVF list."""
    from bigtrees_spark.operators.similarity import ivf_topk

    q = vec_df.where("vec_id >= 100")  # the 10 perturbed twins
    got = ivf_topk(q, vec_df, k=1, dim=DIM, n_centroids=8, n_probe=3).collect()
    hit = sum(1 for r in got if r.neighbor_id == r.query_id - 100)
    assert hit >= 8
