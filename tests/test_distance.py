"""Distance-kernel tests against numpy oracles.

Mirrors the reference's known-value distance checks
(pkg/vectortypes/distances_test.go) plus batched-vs-scalar equivalence.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quiver_tpu.ops.distance import distance_pairs, pairwise_distance
from quiver_tpu.types import DistanceType

METRICS = list(DistanceType)


def oracle_distance(a: np.ndarray, b: np.ndarray, metric: DistanceType) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if metric == DistanceType.COSINE:
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 1.0
        sim = float(np.clip(np.dot(a, b) / (na * nb), -1.0, 1.0))
        return 1.0 - sim
    if metric == DistanceType.EUCLIDEAN:
        return float(np.linalg.norm(a - b))
    if metric == DistanceType.SQUARED_EUCLIDEAN:
        return float(np.sum((a - b) ** 2))
    if metric == DistanceType.DOT_PRODUCT:
        return 1.0 - float(np.dot(a, b))
    if metric == DistanceType.MANHATTAN:
        return float(np.sum(np.abs(a - b)))
    raise AssertionError(metric)


@pytest.mark.parametrize("metric", METRICS)
def test_pairwise_matches_oracle(metric):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    v = rng.normal(size=(17, 32)).astype(np.float32)
    got = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(v), metric))
    for i in range(q.shape[0]):
        for j in range(v.shape[0]):
            want = oracle_distance(q[i], v[j], metric)
            assert got[i, j] == pytest.approx(want, rel=1e-4, abs=1e-4), (
                metric,
                i,
                j,
            )


def test_cosine_known_values():
    # Identical vectors -> 0; orthogonal -> 1; opposite -> 2.
    a = jnp.asarray([[1.0, 0.0]])
    assert float(pairwise_distance(a, a, "cosine")[0, 0]) == pytest.approx(0.0, abs=1e-6)
    b = jnp.asarray([[0.0, 1.0]])
    assert float(pairwise_distance(a, b, "cosine")[0, 0]) == pytest.approx(1.0, abs=1e-6)
    c = jnp.asarray([[-1.0, 0.0]])
    assert float(pairwise_distance(a, c, "cosine")[0, 0]) == pytest.approx(2.0, abs=1e-6)


def test_cosine_zero_vector_guard():
    # Zero vector on either side -> distance 1 (reference distances.go:12-40).
    z = jnp.zeros((1, 8))
    x = jnp.ones((1, 8))
    assert float(pairwise_distance(x, z, "cosine")[0, 0]) == pytest.approx(1.0)
    assert float(pairwise_distance(z, x, "cosine")[0, 0]) == pytest.approx(1.0)
    assert float(pairwise_distance(z, z, "cosine")[0, 0]) == pytest.approx(1.0)


def test_dot_product_known_values():
    a = jnp.asarray([[2.0, 3.0]])
    b = jnp.asarray([[4.0, 5.0]])
    assert float(pairwise_distance(a, b, "dot_product")[0, 0]) == pytest.approx(1.0 - 23.0)


@pytest.mark.parametrize("metric", METRICS)
def test_distance_pairs_matches_pairwise(metric):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(9, 16)).astype(np.float32)
    b = rng.normal(size=(9, 16)).astype(np.float32)
    paired = np.asarray(distance_pairs(jnp.asarray(a), jnp.asarray(b), metric))
    full = np.asarray(pairwise_distance(jnp.asarray(a), jnp.asarray(b), metric))
    np.testing.assert_allclose(paired, np.diagonal(full), rtol=1e-4, atol=1e-5)


def test_precomputed_norms_match_on_the_fly():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(3, 24)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(11, 24)).astype(np.float32))
    from quiver_tpu.ops.distance import inv_norms, norms_sq

    ns = norms_sq(v)
    d1 = pairwise_distance(q, v, "cosine", v_norms_sq=ns, v_inv_norms=inv_norms(ns))
    d2 = pairwise_distance(q, v, "cosine")
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


# -------------------------------------------------------- vector utilities
# (reference semantics: pkg/vectortypes/distances_test.go — normalize
# zero-guard, dim-mismatch errors, magnitude; types.go IsNormalized)

from quiver_tpu.ops import vector_utils as vu


def test_normalize_and_is_normalized():
    v = np.array([3.0, 4.0], np.float32)
    n = vu.normalize(v)
    np.testing.assert_allclose(n, [0.6, 0.8], rtol=1e-6)
    assert vu.is_normalized(n)
    assert not vu.is_normalized(v)
    # zero vector passes through unchanged (distances.go:124-126)
    z = vu.normalize(np.zeros(4, np.float32))
    np.testing.assert_array_equal(z, np.zeros(4))
    assert not vu.is_normalized(np.zeros(4, np.float32))
    # empty vector is not normalized (types.go:79-82)
    assert not vu.is_normalized(np.zeros(0, np.float32))


def test_vector_utils_batched():
    rng = np.random.default_rng(0)
    batch = rng.normal(size=(5, 8)).astype(np.float32)
    n = vu.normalize(batch)
    assert n.shape == (5, 8)
    np.testing.assert_allclose(vu.magnitude(n), np.ones(5), rtol=1e-5)
    flags = vu.is_normalized(n)
    assert flags.shape == (5,) and flags.all()
    # per-row results equal single-vector results
    for i in range(5):
        np.testing.assert_allclose(n[i], vu.normalize(batch[i]), rtol=1e-6)


def test_vector_arithmetic():
    a = np.array([1.0, 2.0], np.float32)
    b = np.array([3.0, 5.0], np.float32)
    np.testing.assert_array_equal(vu.add(a, b), [4, 7])
    np.testing.assert_array_equal(vu.subtract(a, b), [-2, -3])
    np.testing.assert_array_equal(vu.scale(a, 2.5), [2.5, 5.0])
    np.testing.assert_allclose(vu.magnitude(b), np.sqrt(34.0), rtol=1e-6)
    with pytest.raises(ValueError):
        vu.add(a, np.zeros(3, np.float32))  # dim mismatch errors
    c = vu.clone(a)
    c[0] = 99
    assert a[0] == 1.0  # deep copy
    np.testing.assert_array_equal(vu.zeros(3), np.zeros(3))
    r1, r2 = vu.random_vector(16, seed=7), vu.random_vector(16, seed=7)
    np.testing.assert_array_equal(r1, r2)
