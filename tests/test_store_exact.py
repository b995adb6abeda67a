"""VectorStore + ExactIndex tests: oracle recall, masks, deletes, growth,
negative-example rerank (reference test pattern: SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quiver_tpu.core.store import VectorStore
from quiver_tpu.index.exact import ExactIndex
from quiver_tpu.types import DistanceType

from tests.test_distance import oracle_distance


def make_store(n=100, d=16, metric="cosine", seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store = VectorStore(dim=d, metric=metric)
    store.add_batch([f"v{i}" for i in range(n)], vecs)
    return store, vecs


def oracle_topk(q, vecs, metric, k):
    dists = np.array([oracle_distance(q, v, DistanceType.parse(metric)) for v in vecs])
    order = np.argsort(dists, kind="stable")[:k]
    return order, dists[order]


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product", "manhattan"])
def test_exact_search_matches_oracle(metric):
    store, vecs = make_store(metric=metric)
    idx = ExactIndex(store)
    rng = np.random.default_rng(42)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    dist, slots = idx.search_slots(q, k=10)
    for b in range(5):
        want_order, want_dist = oracle_topk(q[b], vecs, metric, 10)
        np.testing.assert_allclose(dist[b], want_dist, rtol=1e-3, atol=1e-4)
        # ids must match wherever distances are distinct
        got_ids = [store.id_of(int(s)) for s in slots[b]]
        want_ids = [f"v{i}" for i in want_order]
        assert got_ids == want_ids


def test_insert_then_search_self_recall():
    # Every inserted vector appears as its own nearest neighbor
    # (reference: pkg/hnsw/hnsw_property_test.go:15-77; strict here since exact).
    store, vecs = make_store(n=50, metric="euclidean")
    idx = ExactIndex(store)
    dist, slots = idx.search_slots(vecs, k=1)
    for i in range(50):
        assert store.id_of(int(slots[i, 0])) == f"v{i}"
        # matmul-form L2 (||q||^2+||v||^2-2qv) has ~1e-3 cancellation error
        # at self-distance; the *ranking* above is what must be exact.
        assert dist[i, 0] == pytest.approx(0.0, abs=5e-3)


def test_results_sorted_and_k_capped():
    store, _ = make_store(n=7)
    idx = ExactIndex(store)
    res = idx.search(np.ones(16, np.float32), k=20)
    assert len(res) == 7  # k never exceeds size
    ds = [d for _, d in res]
    assert ds == sorted(ds)


def test_delete_removes_from_results():
    store, vecs = make_store(n=20, metric="euclidean")
    idx = ExactIndex(store)
    assert store.delete("v3")
    assert not store.delete("v3")  # double delete
    res = idx.search(vecs[3], k=20)
    assert "v3" not in [r[0] for r in res]
    assert len(res) == 19
    assert store.size == 19


def test_slot_reuse_after_delete():
    store, _ = make_store(n=10)
    store.delete("v5")
    slot = store.add("v_new", np.ones(16, np.float32))
    assert store.id_of(slot) == "v_new"
    assert store.size == 10


def test_capacity_growth_preserves_data():
    d = 8
    store = VectorStore(dim=d, metric="euclidean", capacity=1024)
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(3000, d)).astype(np.float32)
    store.add_batch([f"a{i}" for i in range(3000)], vecs)
    assert store.capacity >= 3000
    idx = ExactIndex(store, tile=1024)
    _, slots = idx.search_slots(vecs[:4], k=1)
    assert [store.id_of(int(s)) for s in slots[:, 0]] == [f"a{i}" for i in range(4)]


def test_duplicate_insert_rejected():
    store, _ = make_store(n=5)
    with pytest.raises(ValueError, match="already exists"):
        store.add("v1", np.ones(16, np.float32))


def test_dimension_mismatch_rejected():
    store, _ = make_store(n=5)
    with pytest.raises(ValueError):
        store.add("x", np.ones(8, np.float32))


def test_empty_store_search():
    store = VectorStore(dim=4)
    idx = ExactIndex(store)
    assert idx.search(np.ones(4, np.float32), k=5) == []


def test_update_changes_vector():
    store, vecs = make_store(n=10, metric="euclidean")
    target = np.full(16, 9.0, np.float32)
    store.update_batch(["v2"], [target])
    idx = ExactIndex(store)
    res = idx.search(target, k=1)
    assert res[0][0] == "v2"
    assert res[0][1] == pytest.approx(0.0, abs=1e-4)


def test_extra_mask_filters_results():
    store, vecs = make_store(n=30, metric="euclidean")
    idx = ExactIndex(store)
    mask = np.zeros(store.capacity, dtype=bool)
    allowed_slots = [store.slot_of(f"v{i}") for i in (1, 4, 7)]
    mask[allowed_slots] = True
    dist, slots = idx.search_slots(vecs[:2], k=10, mask=jnp.asarray(mask))
    for b in range(2):
        got = {store.id_of(int(s)) for s in slots[b] if s >= 0}
        assert got == {"v1", "v4", "v7"}


def test_negative_example_rerank():
    # Points near the negative example get pushed down
    # (formula: d_q - w * d_neg, reference pkg/hnsw/adapter.go:417-421).
    d = 4
    store = VectorStore(dim=d, metric="euclidean")
    store.add("near_q", np.array([1.0, 0, 0, 0], np.float32))
    store.add("near_q_and_neg", np.array([0.9, 0.1, 0, 0], np.float32))
    store.add("far", np.array([0, 0, 5, 5], np.float32))
    idx = ExactIndex(store)
    q = np.array([1.0, 0, 0, 0], np.float32)
    neg = np.array([0.9, 0.1, 0, 0], np.float32)
    dist, slots = idx.search_slots(q[None], k=2, negative=neg[None], negative_weight=5.0)
    ids = [store.id_of(int(s)) for s in slots[0] if s >= 0]
    # adjusted = d_q - w*d_neg: being far from the negative is rewarded, so at
    # heavy weight the vector identical to the negative drops out of the top-2
    # entirely and 'far' (huge d_neg) ranks first.
    assert "near_q_and_neg" not in ids
    assert ids == ["far", "near_q"]
    # reported distances are the ORIGINAL query distances, not adjusted scores
    assert dist[0][1] == pytest.approx(0.0, abs=1e-4)
    # without a negative example, plain ranking holds
    _, plain = idx.search_slots(q[None], k=2)
    assert [store.id_of(int(s)) for s in plain[0]] == ["near_q", "near_q_and_neg"]


def test_snapshot_roundtrip():
    store, vecs = make_store(n=12)
    store.delete("v0")
    ids, mat, mds = store.snapshot()
    assert len(ids) == 11 and mat.shape == (11, 16)
    assert "v0" not in ids


@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_bfloat16_fast_path_recall(metric):
    # bf16 scan keeps top-10 recall >= 0.9 vs the f32 oracle on random data.
    store, vecs = make_store(n=500, d=64, metric=metric, seed=7)
    f32 = ExactIndex(store, compute_dtype=jnp.float32)
    bf16 = ExactIndex(store, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(8)
    q = rng.normal(size=(8, 64)).astype(np.float32)
    _, s32 = f32.search_slots(q, k=10)
    _, s16 = bf16.search_slots(q, k=10)
    recall = np.mean([
        len(set(s32[b].tolist()) & set(s16[b].tolist())) / 10 for b in range(8)
    ])
    assert recall >= 0.9
