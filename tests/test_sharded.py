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


# ------------------------------------------------------------- sharded HNSW

from quiver_tpu.parallel.sharded_graph import ShardedHNSWIndex


def make_graph(mesh, n=2000, metric="euclidean", seed=3, **cfg):
    store, vecs = make_store(n=n, metric=metric, seed=seed)
    eng = ShardedHNSWIndex(store, mesh, ef_search=64, build_batch=512, **cfg)
    eng.on_insert(np.arange(n), vecs)
    return store, vecs, eng


def test_sharded_hnsw_self_recall(mesh):
    store, vecs, eng = make_graph(mesh)
    d, i = eng.search_slots(vecs[:64], k=1)
    assert (i[:, 0] == np.arange(64)).mean() >= 0.98
    # self-distance is sqrt(f32 rounding residue) — ~2e-3 at d=24
    np.testing.assert_allclose(d[i[:, 0] == np.arange(64), 0], 0.0, atol=5e-3)


def test_sharded_hnsw_recall_vs_oracle(mesh):
    store, vecs, eng = make_graph(mesh)
    rng = np.random.default_rng(7)
    q = (rng.normal(size=(32, D)) * 0.3 + vecs[:32]).astype(np.float32)
    k = 10
    od, oi = ExactIndex(store).search_slots(q, k)
    gd, gi = eng.search_slots(q, k)
    recall = np.mean([
        len(set(gi[b].tolist()) & set(oi[b].tolist())) / k for b in range(32)
    ])
    assert recall >= 0.9, f"sharded graph recall {recall}"


def test_sharded_hnsw_results_sorted_and_valid(mesh):
    store, vecs, eng = make_graph(mesh)
    d, i = eng.search_slots(vecs[5:9], k=8)
    for b in range(4):
        live = d[b][i[b] >= 0]
        assert (np.diff(live) >= -1e-6).all()
    assert (i >= -1).all() and (i < store.capacity).all()


def test_sharded_hnsw_delete_and_underfill(mesh):
    store, vecs, eng = make_graph(mesh, n=300)
    # delete the true nearest neighbor of query 0; it must vanish
    d, i = eng.search_slots(vecs[0], k=2)
    victim = int(i[0, 0])
    store.delete_batch([store.id_of(victim)])
    eng.on_delete(np.asarray([victim]))
    d2, i2 = eng.search_slots(vecs[0], k=5)
    assert victim not in set(i2[0].tolist())
    # k near the corpus size exercises the under-fill supplement merge
    d3, i3 = eng.search_slots(vecs[0], k=299)
    assert (i3[0] >= 0).sum() == 299


def test_sharded_hnsw_mask_falls_back_sharded_exact(mesh):
    store, vecs, eng = make_graph(mesh, n=1024)
    mask = np.zeros(store.capacity, bool)
    mask[:100] = True
    d, i = eng.search_slots(vecs[:4], k=5, mask=mask)
    assert (i[i >= 0] < 100).all()


def test_sharded_hnsw_negative_rerank(mesh):
    store, vecs, eng = make_graph(mesh, n=1024)
    q = vecs[:8]
    d0, i0 = eng.search_slots(q, k=5)
    dn, in_ = eng.search_slots(q, k=5, negative=vecs[:8], negative_weight=5.0)
    # pushing hard away from the query itself must change the ranking
    assert (in_[:, 0] != i0[:, 0]).any()


def test_sharded_hnsw_balanced_shards(mesh):
    store, vecs, eng = make_graph(mesh, n=1000)
    sizes = [s.size for s in eng._sub_stores]
    assert max(sizes) - min(sizes) <= 1


def test_sharded_hybrid_engine_via_db(tmp_path, mesh):
    from quiver_tpu.core.db import DB, DBOptions
    from quiver_tpu.types import SearchRequest

    db = DB(DBOptions(
        storage_path=str(tmp_path / "d"), default_engine="sharded_hybrid",
        flush_interval_s=0, engine_config={"mesh": mesh},
    ))
    c = db.create_collection("s", D, "euclidean")
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(1500, D)).astype(np.float32)
    c.add_batch([f"v{i}" for i in range(1500)], vecs)
    r = c.search(SearchRequest(vector=vecs[3], top_k=3))
    assert r.results[0].id == "v3"
    db.close()


def test_sharded_hnsw_incremental_stack_on_write(mesh):
    """Writes after the first stack must NOT trigger a full host restack
    (VERDICT r2 weak #6): the change feeds scatter just the mutated rows."""
    store, vecs, eng = make_graph(mesh, n=1500)
    _ = eng.search_slots(vecs[:4], k=3)  # builds the stack
    calls = {"full": 0}
    orig = eng._stack_full

    def counting(sig):
        calls["full"] += 1
        return orig(sig)

    eng._stack_full = counting
    rng = np.random.default_rng(11)
    new = (vecs[:8] + 0.01 * rng.normal(size=(8, D))).astype(np.float32)
    slots = store.add_batch([f"w{j}" for j in range(8)], new)
    eng.on_insert(slots, new)
    d, i = eng.search_slots(new, k=1)
    assert (i[:, 0] == np.asarray(slots)).mean() >= 0.9
    # delete: masked out, still incremental
    store.delete("w0")
    eng.on_delete(np.asarray([slots[0]]))
    _, i2 = eng.search_slots(new[:1], k=1)
    assert i2[0, 0] != slots[0]
    assert calls["full"] == 0, "write caused a full restack"


def test_sharded_hnsw_incremental_matches_fresh_stack(mesh):
    """Result parity: the incrementally-updated stack answers exactly like
    a from-scratch restack of the same subgraphs."""
    store, vecs, eng = make_graph(mesh, n=1200)
    _ = eng.search_slots(vecs[:4], k=3)
    rng = np.random.default_rng(13)
    new = (vecs[100:116] + 0.01 * rng.normal(size=(16, D))).astype(np.float32)
    slots = store.add_batch([f"y{j}" for j in range(16)], new)
    eng.on_insert(slots, new)
    q = np.concatenate([new[:4], vecs[:4]])
    d_inc, i_inc = eng.search_slots(q, k=8)
    eng._stacked = None  # force the full restack path
    eng._stack_sig = None
    d_full, i_full = eng.search_slots(q, k=8)
    np.testing.assert_array_equal(i_inc, i_full)
    np.testing.assert_allclose(d_inc, d_full, rtol=1e-5, atol=1e-5)


def test_sharded_hnsw_topology_roundtrip(mesh):
    store, vecs, eng = make_graph(mesh, n=1200)
    data = eng.export_topology()
    assert data is not None and bytes(data["kind"]) == b"sharded_hnsw"
    eng2 = ShardedHNSWIndex(store, mesh, ef_search=64, build_batch=512)
    eng2.import_topology(data, np.arange(store.capacity))
    d1, i1 = eng.search_slots(vecs[:16], k=5)
    d2, i2 = eng2.search_slots(vecs[:16], k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)


def test_sharded_hnsw_topology_mesh_mismatch_ignored(mesh):
    store, vecs, eng = make_graph(mesh, n=600)
    data = eng.export_topology()
    data["n_shards"] = np.int64(4)  # pretend it came from a 4-shard mesh
    eng2 = ShardedHNSWIndex(store, mesh, ef_search=64, build_batch=512)
    eng2.import_topology(data, np.arange(store.capacity))
    # rejected: no subgraphs restored; engine still serves via fallback
    assert all(sub.entry_point < 0 for sub in eng2._subs)


def test_sharded_hnsw_subindex_rebuild_resyncs_mirror(mesh):
    """A sub-index compaction (rebuild-from-live) replaces its layers —
    the stacked mesh mirror must resync (fresh layers feed None) and keep
    answering exactly like a from-scratch restack."""
    store, vecs, eng = make_graph(mesh, n=1200)
    _ = eng.search_slots(vecs[:4], k=3)  # builds the stack
    eng._subs[0].rebuild()  # what churn-triggered compaction performs
    q = vecs[:16]
    d_inc, i_inc = eng.search_slots(q, k=8)
    eng._stacked = None  # force the full restack path
    eng._stack_sig = None
    d_full, i_full = eng.search_slots(q, k=8)
    np.testing.assert_array_equal(i_inc, i_full)
    np.testing.assert_allclose(d_inc, d_full, rtol=1e-5, atol=1e-5)


def test_fuzz_sharded_hnsw_random_ops(mesh):
    """The sharded graph under random op churn (same harness as the
    single-chip engine fuzz): incremental stack scatters, per-shard
    tombstones and the under-fill supplement all hold up."""
    from tests.test_fuzz_engines import _run_fuzz

    _run_fuzz(
        lambda s: ShardedHNSWIndex(s, mesh, build_batch=256),
        seed=500, steps=60,
    )
