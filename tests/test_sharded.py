"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded scan
equals single-chip results, masks shard correctly, engine protocol works
(SURVEY.md §4: same suite on 1 device and on a mesh of N)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quiver_tpu.core.store import VectorStore
from quiver_tpu.index.exact import ExactIndex
from quiver_tpu.parallel.sharded import ShardedExactIndex, make_mesh

D = 24


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def make_store(n=3000, metric="cosine", seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    store = VectorStore(dim=D, metric=metric)
    store.add_batch([f"v{i}" for i in range(n)], vecs)
    return store, vecs


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product", "manhattan"])
def test_sharded_equals_single_chip(mesh, metric):
    store, vecs = make_store(metric=metric)
    single = ExactIndex(store)
    sharded = ShardedExactIndex(store, mesh)
    rng = np.random.default_rng(1)
    q = rng.normal(size=(6, D)).astype(np.float32)
    d1, s1 = single.search_slots(q, k=10)
    d2, s2 = sharded.search_slots(q, k=10)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)


def test_sharded_mask(mesh):
    store, vecs = make_store()
    sharded = ShardedExactIndex(store, mesh)
    allowed = [store.slot_of(f"v{i}") for i in (5, 900, 2500)]  # across shards
    mask = np.zeros(store.capacity, bool)
    mask[allowed] = True
    _, slots = sharded.search_slots(vecs[:2], k=10, mask=mask)
    for b in range(2):
        got = {int(s) for s in slots[b] if s >= 0}
        assert got == set(allowed)


def test_sharded_negative_rerank(mesh):
    store, vecs = make_store(n=500)
    single = ExactIndex(store)
    sharded = ShardedExactIndex(store, mesh)
    q = vecs[:3]
    neg = vecs[10:13]
    d1, s1 = single.search_slots(q, k=5, negative=neg, negative_weight=1.0)
    d2, s2 = sharded.search_slots(q, k=5, negative=neg, negative_weight=1.0)
    np.testing.assert_array_equal(s1, s2)


def test_sharded_after_mutation(mesh):
    store, vecs = make_store(n=1200)
    sharded = ShardedExactIndex(store, mesh)
    _, s = sharded.search_slots(vecs[:1], k=1)
    assert store.id_of(int(s[0, 0])) == "v0"
    store.delete("v0")
    _, s = sharded.search_slots(vecs[:1], k=1)  # resyncs sharded view
    assert store.id_of(int(s[0, 0])) != "v0"


def test_mesh_too_big_rejected():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(99)


def test_collection_with_sharded_engine(mesh):
    from quiver_tpu.core.collection import Collection
    from quiver_tpu.types import Filter, SearchRequest

    c = Collection(
        "dist", D, "euclidean",
        engine_factory=lambda store: ShardedExactIndex(store, mesh),
    )
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(600, D)).astype(np.float32)
    c.add_batch([f"x{i}" for i in range(600)],
                vecs, [{"p": i % 3} for i in range(600)])
    resp = c.search(SearchRequest(vector=vecs[7], top_k=3,
                                  filters=[Filter("p", "=", 1)]))
    assert all(int(r.id[1:]) % 3 == 1 for r in resp.results)
    assert resp.results[0].id == "x7"


def test_sharded_engine_via_db(tmp_path, mesh):
    from quiver_tpu.core.db import DB, DBOptions
    from quiver_tpu.types import SearchRequest

    db = DB(DBOptions(storage_path=str(tmp_path / "d"), flush_interval_s=0,
                      default_engine="sharded_exact",
                      engine_config={"mesh": mesh}))
    c = db.create_collection("dist", D, "euclidean")
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(300, D)).astype(np.float32)
    c.add_batch([f"v{i}" for i in range(300)], vecs)
    r = c.search(SearchRequest(vector=vecs[9], top_k=1))
    assert r.results[0].id == "v9"
    db.close()
