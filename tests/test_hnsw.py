"""HNSW engine tests: recall vs exact oracle, property battery, deletes,
reproducibility, negative rerank, under-fill supplement.

Mirrors the reference's property-test pattern (pkg/hnsw/hnsw_property_test.go:
insert-then-search recall, sorted results, k caps, delete removal, exact-
distance oracle) — but with deterministic builds the reference couldn't have
(hnsw_property_test.go:334-339 skips determinism)."""

import numpy as np
import pytest

from quiver_tpu.core.store import VectorStore
from quiver_tpu.index.exact import ExactIndex
from quiver_tpu.index.hnsw import HNSWConfig, HNSWIndex

D = 32


def build(n=600, d=D, metric="euclidean", seed=0, **cfg):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store = VectorStore(dim=d, metric=metric)
    cfg.setdefault("build_batch", 256)
    idx = HNSWIndex(store, **cfg)
    slots = store.add_batch([f"v{i}" for i in range(n)], vecs)
    idx.on_insert(slots, vecs)
    return store, idx, vecs


def recall_at_k(idx, exact, queries, k=10):
    _, approx = idx.search_slots(queries, k)
    _, truth = exact.search_slots(queries, k)
    hits = 0
    for b in range(len(queries)):
        hits += len(set(approx[b].tolist()) & set(truth[b].tolist()))
    return hits / (len(queries) * k)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_recall_against_oracle(metric):
    store, idx, vecs = build(metric=metric)
    exact = ExactIndex(store)
    rng = np.random.default_rng(1)
    queries = rng.normal(size=(16, D)).astype(np.float32)
    r = recall_at_k(idx, exact, queries, k=10)
    assert r >= 0.9, f"recall {r} too low for {metric}"


def test_visited_bitmap_mode():
    # true O(N) visited bitset (reference VisitedList semantics,
    # pkg/arrowindex/graph.go:16-109): same-or-better recall than the
    # rolling ring, identical result contract
    store, idx, vecs = build(n=800)
    exact = ExactIndex(store)
    rng = np.random.default_rng(2)
    queries = rng.normal(size=(16, D)).astype(np.float32)
    r_ring = recall_at_k(idx, exact, queries, k=10)
    idx.set_optimization_parameters(visited="bitmap")
    assert idx.get_optimization_parameters()["visited"] == "bitmap"
    r_bitmap = recall_at_k(idx, exact, queries, k=10)
    assert r_bitmap >= 0.9
    assert r_bitmap >= r_ring - 0.05  # no regression vs the ring
    d, i = idx.search_slots(vecs[:8], k=5)
    assert (i[:, 0] == np.arange(8)).all()  # self-recall intact
    live = d[0][i[0] >= 0]
    assert (np.diff(live) >= -1e-6).all()
    with pytest.raises(ValueError):
        idx.set_optimization_parameters(visited="nope")


def test_insert_then_search_self_recall():
    store, idx, vecs = build(n=300)
    _, slots = idx.search_slots(vecs[:50], k=1)
    hits = sum(store.id_of(int(slots[i, 0])) == f"v{i}" for i in range(50))
    assert hits >= 48  # approximate engine; near-perfect self-recall


def test_results_sorted_and_k_capped():
    store, idx, _ = build(n=100)
    q = np.random.default_rng(2).normal(size=(1, D)).astype(np.float32)
    dist, slots = idx.search_slots(q, k=150)
    live = dist[0][slots[0] >= 0]
    assert np.all(np.diff(live) >= -1e-5)  # ascending
    assert (slots[0] >= 0).sum() == 100  # k never exceeds size


def test_delete_removes_from_results():
    store, idx, vecs = build(n=200)
    target_slots = [store.slot_of(f"v{i}") for i in range(5)]
    store.delete_batch([f"v{i}" for i in range(5)])
    idx.on_delete(np.asarray(target_slots))
    dist, slots = idx.search_slots(vecs[:5], k=10)
    for b in range(5):
        ids = {store.id_of(int(s)) for s in slots[b] if s >= 0}
        assert f"v{b}" not in ids
        assert len(ids) == 10  # still fills k from live nodes


def test_delete_entry_point_reelects():
    store, idx, vecs = build(n=150)
    ep = idx.entry_point
    vid = store.id_of(ep)
    store.delete(vid)
    idx.on_delete(np.asarray([ep]))
    assert idx.entry_point != ep
    # search still works
    _, slots = idx.search_slots(vecs[:3], k=5)
    assert (slots >= 0).all()


def test_delete_all_then_search():
    store, idx, vecs = build(n=120)
    all_slots = [store.slot_of(f"v{i}") for i in range(120)]
    store.delete_batch([f"v{i}" for i in range(120)])
    idx.on_delete(np.asarray(all_slots))
    dist, slots = idx.search_slots(vecs[:2], k=5)
    assert (slots < 0).all()


def test_reproducible_builds():
    _, idx1, vecs = build(n=200, seed=3)
    _, idx2, _ = build(n=200, seed=3)
    np.testing.assert_array_equal(idx1.layer0.adj, idx2.layer0.adj)
    assert idx1.entry_point == idx2.entry_point
    assert idx1.current_max_level == idx2.current_max_level


def test_incremental_inserts_match_quality():
    # inserting in several batches should retain good recall
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(500, D)).astype(np.float32)
    store = VectorStore(dim=D, metric="euclidean")
    idx = HNSWIndex(store, build_batch=128)
    for i in range(0, 500, 100):
        slots = store.add_batch([f"v{j}" for j in range(i, i + 100)], vecs[i : i + 100])
        idx.on_insert(slots, vecs[i : i + 100])
    exact = ExactIndex(store)
    queries = rng.normal(size=(16, D)).astype(np.float32)
    r = recall_at_k(idx, exact, queries, k=10)
    assert r >= 0.85, f"incremental recall {r}"


def test_small_graph_delegates_to_exact():
    store = VectorStore(dim=D, metric="euclidean")
    idx = HNSWIndex(store)
    vecs = np.random.default_rng(0).normal(size=(10, D)).astype(np.float32)
    slots = store.add_batch([f"v{i}" for i in range(10)], vecs)
    idx.on_insert(slots, vecs)
    _, got = idx.search_slots(vecs[:3], k=3)
    exact = ExactIndex(store)
    _, want = exact.search_slots(vecs[:3], k=3)
    np.testing.assert_array_equal(got, want)


def test_mask_delegates_to_exact():
    store, idx, vecs = build(n=100)
    mask = np.zeros(store.capacity, bool)
    mask[[store.slot_of(f"v{i}") for i in (3, 7, 11)]] = True
    import jax.numpy as jnp

    _, slots = idx.search_slots(vecs[:2], k=5, mask=jnp.asarray(mask))
    for b in range(2):
        got = {store.id_of(int(s)) for s in slots[b] if s >= 0}
        assert got == {"v3", "v7", "v11"}


def test_negative_example_on_graph():
    store, idx, vecs = build(n=200)
    dist, slots = idx.search_slots(
        vecs[:2], k=5, negative=vecs[1][None].repeat(2, 0), negative_weight=2.0
    )
    assert (slots >= 0).all()


def test_update_reinserts():
    store, idx, vecs = build(n=150)
    slot = store.slot_of("v7")
    newv = np.full(D, 42.0, np.float32)
    store.update_batch(["v7"], [newv])
    idx.on_update(np.asarray([slot]), newv[None])
    _, slots = idx.search_slots(newv[None], k=1)
    assert store.id_of(int(slots[0, 0])) == "v7"


def test_config_defaults_match_reference():
    c = HNSWConfig()
    assert (c.m, c.m0, c.ef_construction, c.ef_search, c.max_level) == (
        16, 32, 200, 100, 16,
    )


def test_select_neighbors_keep_pruned_fills_degree():
    """keep_pruned back-fills occluded candidates: diversity decides the
    ORDER, not the edge count (hnswlib keepPrunedConnections)."""
    import jax.numpy as jnp

    from quiver_tpu.ops.hnsw_kernels import select_neighbors

    # one tight clump near the query plus two far outliers: the occlusion
    # rule alone would keep ~1 clump member + the outliers
    rng = np.random.default_rng(0)
    d = 8
    clump = 0.01 * rng.normal(size=(6, d)).astype(np.float32)
    far = np.stack([np.full(d, 5.0), np.full(d, -5.0)]).astype(np.float32)
    vectors = np.concatenate([clump, far]).astype(np.float32)
    q = np.zeros((1, d), np.float32)
    ids = np.arange(8, dtype=np.int32)[None, :]
    dist = np.linalg.norm(vectors - q[0], axis=1)[None, :].astype(np.float32)

    kept_i, kept_d = select_neighbors(
        jnp.asarray(q), jnp.asarray(ids), jnp.asarray(dist),
        jnp.asarray(vectors), metric="euclidean", m=6, keep_pruned=True,
    )
    pruned_i, _ = select_neighbors(
        jnp.asarray(q), jnp.asarray(ids), jnp.asarray(dist),
        jnp.asarray(vectors), metric="euclidean", m=6, keep_pruned=False,
    )
    n_kept = int((np.asarray(kept_i)[0] >= 0).sum())
    n_pruned = int((np.asarray(pruned_i)[0] >= 0).sum())
    assert n_kept == 6, "back-fill must reach the full degree"
    assert n_pruned < n_kept, "occlusion-only must prune the clump"
    # the diversity winners must still lead the kept list
    lead = set(np.asarray(pruned_i)[0][np.asarray(pruned_i)[0] >= 0].tolist())
    assert lead <= set(np.asarray(kept_i)[0].tolist())
    # distances stay aligned with ids and ascending within groups
    kd = np.asarray(kept_d)[0]
    ki = np.asarray(kept_i)[0]
    true_d = np.linalg.norm(vectors[ki] - q[0], axis=1)
    np.testing.assert_allclose(kd, true_d, rtol=1e-5, atol=1e-5)


def test_ef_changes_beam_behavior():
    """Termination is ef-faithful: a larger ef explores at least as much
    (round-2 bug: ef=50 and ef=100 compiled to the identical search)."""
    store, idx, vecs = build(n=3000, seed=3)
    q = (vecs[:64] + 0.15 * np.random.default_rng(9).normal(
        size=(64, vecs.shape[1]))).astype(np.float32)
    exact = ExactIndex(store)
    _, truth = exact.search_slots(q, 10)
    recs = []
    for ef in (16, 64, 256):
        idx.set_optimization_parameters(ef_search=ef)
        _, got = idx.search_slots(q, 10)
        hit = np.mean([
            len(set(got[b].tolist()) & set(truth[b].tolist())) / 10
            for b in range(len(got))
        ])
        recs.append(hit)
    assert recs[-1] >= recs[0] - 1e-9
    assert recs[-1] >= 0.9


def test_update_churn_grows_row_space_past_capacity():
    # update = delete + reinsert appends a fresh adjacency row per op, so
    # sustained churn legitimately needs MORE rows than the store has
    # slots; the device row pad must grow (it used to cap at capacity:
    # new rows' edges were scatter-dropped and query gathers clamped onto
    # the last row — silent graph corruption)
    rng = np.random.default_rng(3)
    n = 600
    store = VectorStore(dim=D, metric="euclidean", capacity=n)  # -> 1024
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    idx = HNSWIndex(store, build_batch=256)
    slots = store.add_batch([f"v{i}" for i in range(n)], vecs)
    idx.on_insert(slots, vecs)
    ids = [f"v{i}" for i in range(n)]
    cur = vecs.copy()
    for r in range(4):
        pick = rng.choice(n, size=128, replace=False)
        fresh = rng.normal(size=(128, D)).astype(np.float32)
        sl = np.asarray([store.slot_of(ids[p]) for p in pick])
        store.update_batch([ids[p] for p in pick], fresh)
        idx.on_update(sl, fresh)
        cur[pick] = fresh
    assert len(idx.layer0.nodes) > store.capacity  # churn outgrew slots
    # every row (updated or not) is still reachable at its CURRENT value
    _, got = idx.search_slots(cur, k=1)
    want = np.asarray([store.slot_of(i) for i in ids])
    assert (got[:, 0] == want).mean() >= 0.95


def test_import_topology_into_used_index_refreshes_pos():
    # importing into an index that already SERVED queries must drop the
    # cached device slot->row map (it used to keep routing through the
    # pre-import mapping, silently returning wrong neighbors)
    store1, idx1, vecs = build(n=300)
    data = idx1.export_topology()
    n = 300
    store2 = VectorStore(dim=D, metric="euclidean")
    order = np.arange(n)[::-1]
    slots2 = store2.add_batch([f"v{i}" for i in order], vecs[order])
    idx2 = HNSWIndex(store2, build_batch=256)
    idx2.on_insert(slots2, vecs[order])
    idx2.search_slots(vecs[:8], k=5)  # hot device caches
    remap = np.full(store1.capacity, -1, np.int64)
    for i in range(n):
        remap[store1.slot_of(f"v{i}")] = store2.slot_of(f"v{i}")
    idx2.import_topology(data, remap)
    _, got = idx2.search_slots(vecs[:64], k=1)
    want = np.asarray([store2.slot_of(f"v{i}") for i in range(64)])
    assert (got[:, 0] == want).mean() >= 0.95


def test_churn_compaction_rebuilds_row_space():
    # with compact_growth small, sustained update churn triggers a
    # rebuild-from-live: rows shrink back to the live count and every
    # current vector stays reachable
    rng = np.random.default_rng(5)
    n = 1200  # churn appends rows past the 4096-row compaction floor
    store = VectorStore(dim=D, metric="euclidean", capacity=n)
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    idx = HNSWIndex(store, build_batch=512, compact_growth=3.0)
    slots = store.add_batch([f"v{i}" for i in range(n)], vecs)
    idx.on_insert(slots, vecs)
    ids = [f"v{i}" for i in range(n)]
    cur = vecs.copy()
    for r in range(8):
        pick = rng.choice(n, size=512, replace=False)
        fresh = rng.normal(size=(512, D)).astype(np.float32)
        sl = np.asarray([store.slot_of(ids[p]) for p in pick])
        store.update_batch([ids[p] for p in pick], fresh)
        idx.on_update(sl, fresh)
        cur[pick] = fresh
        if idx.get_detailed_metrics()["compactions"]:
            break
    m = idx.get_detailed_metrics()
    assert m["compactions"] >= 1, "churn never triggered compaction"
    assert len(idx.layer0.nodes) <= 3.0 * n  # row space bounded again
    _, got = idx.search_slots(cur[:256], k=1)
    want = np.asarray([store.slot_of(i) for i in ids[:256]])
    assert (got[:, 0] == want).mean() >= 0.95
