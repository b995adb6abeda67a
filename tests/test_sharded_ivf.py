"""Sharded IVF tests on the virtual 8-device CPU mesh: the cluster-sharded
engine matches the single-chip engine's quality, masks/negatives/writes/
topology behave, and the reserved-cluster id layout holds its invariants
(SURVEY.md §4: same suite on 1 device and on a mesh of N; VERDICT r2
missing #1)."""

import jax
import numpy as np
import pytest

from quiver_tpu.core.store import VectorStore
from quiver_tpu.index.exact import ExactIndex
from quiver_tpu.index.ivf import IVFConfig, IVFIndex
from quiver_tpu.parallel.sharded import make_mesh
from quiver_tpu.parallel.sharded_ivf import ShardedIVFIndex

D = 32


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def clustered(n, n_centers=40, seed=0, scale=0.15):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, D)).astype(np.float32)
    which = rng.integers(0, n_centers, n)
    return (centers[which] + scale * rng.normal(size=(n, D))).astype(np.float32)


def make(mesh, n=5000, metric="euclidean", n_probe=8, **cfg):
    vecs = clustered(n)
    store = VectorStore(dim=D, metric=metric)
    slots = store.add_batch([f"v{i}" for i in range(n)], vecs)
    eng = ShardedIVFIndex(
        store, mesh,
        config=IVFConfig(
            n_probe=n_probe, build_threshold=256, rescore=False, **cfg
        ),
    )
    eng.on_insert(slots, vecs)
    return store, vecs, eng


def recall_vs_oracle(store, eng, q, k=10):
    _, oi = ExactIndex(store).search_slots(q, k)
    _, gi = eng.search_slots(q, k)
    return np.mean([
        len(set(gi[b].tolist()) & set(oi[b].tolist())) / k
        for b in range(len(q))
    ])


def test_sharded_layout_invariants(mesh):
    store, vecs, eng = make(mesh)
    assert eng._built
    live = eng._cluster_live
    KL = eng._k_local
    assert len(live) == 8 * KL
    # every shard has at least one reserved (non-live) id — the pad sentinel
    for s in range(8):
        assert not live[(s + 1) * KL - 1]
    # reserved clusters hold no rows
    keep = np.asarray(eng._block_keep)
    assert not keep[~live].any()
    # every live row is in a live cluster
    pos = eng._slot_pos[eng._slot_pos[:, 0] >= 0]
    assert live[pos[:, 0]].all()


def test_sharded_self_recall(mesh):
    store, vecs, eng = make(mesh)
    d, i = eng.search_slots(vecs[:64], k=1)
    assert (i[:, 0] == np.arange(64)).mean() >= 0.98
    # score-derived distances carry bf16-residual noise (no exact rescore)
    assert (d[:, 0] < 0.2).mean() >= 0.98


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot_product"])
def test_sharded_matches_single_chip_quality(mesh, metric):
    store, vecs, eng = make(mesh, metric=metric, n_probe=16)
    rng = np.random.default_rng(5)
    q = (vecs[:48] + 0.05 * rng.normal(size=(48, D))).astype(np.float32)
    r_sharded = recall_vs_oracle(store, eng, q)
    single = IVFIndex(
        store,
        config=IVFConfig(n_probe=16, build_threshold=256, rescore=False),
    )
    single.build()
    r_single = recall_vs_oracle(store, single, q)
    assert r_sharded >= r_single - 0.02
    assert r_sharded >= 0.9


def test_sharded_results_sorted(mesh):
    store, vecs, eng = make(mesh)
    d, i = eng.search_slots(vecs[:8], k=10)
    for b in range(8):
        live = d[b][i[b] >= 0]
        assert (np.diff(live) >= -1e-6).all()


def test_sharded_mask_fused(mesh):
    store, vecs, eng = make(mesh, n_probe=16)
    allowed = np.arange(0, 5000, 7)
    mask = np.zeros(store.capacity, bool)
    mask[allowed] = True
    _, i = eng.search_slots(vecs[:16], k=10, mask=mask)
    got = i[i >= 0]
    assert len(got) and np.isin(got, allowed).all()


def test_sharded_negative_rerank(mesh):
    store, vecs, eng = make(mesh, n_probe=16)
    q = vecs[:4]
    neg = vecs[100:104]
    d0, i0 = eng.search_slots(q, k=5)
    d1, i1 = eng.search_slots(q, k=5, negative=neg, negative_weight=5.0)
    # a strong negative pull must change some ranking
    assert not np.array_equal(i0, i1)


def test_sharded_write_paths(mesh):
    store, vecs, eng = make(mesh, n=4000)
    new = clustered(16, seed=9) + 0.01
    slots = store.add_batch([f"n{j}" for j in range(16)], new)
    eng.on_insert(slots, new)
    _, i = eng.search_slots(new, k=1)
    assert (i[:, 0] == np.asarray(slots)).mean() >= 0.9
    # delete: masked out at query time
    store.delete("n0")
    eng.on_delete(np.asarray([slots[0]]))
    _, i = eng.search_slots(new[:1], k=1)
    assert i[0, 0] != slots[0]


def test_sharded_insert_lands_in_live_cluster(mesh):
    store, vecs, eng = make(mesh, n=4000)
    new = clustered(8, seed=11)
    slots = store.add_batch([f"m{j}" for j in range(8)], new)
    eng.on_insert(slots, new)
    live = eng._cluster_live
    for s in slots:
        c = eng._slot_pos[s, 0]
        if c >= 0:
            assert live[c]


def test_sharded_refresh_preserves_layout(mesh):
    # refresh() re-lays-out on existing centroids WITHOUT renumbering the
    # cluster id space: cluster_live / k_local / centroids are unchanged,
    # layout invariants hold, and quality still matches single-chip
    store, vecs, eng = make(mesh, n=4000, n_probe=16,
                            rebuild_growth=10.0, retrain_growth=20.0)
    new = clustered(4200, seed=0)[4000:]  # same blob centers as the corpus
    slots = store.add_batch([f"r{j}" for j in range(200)], new)
    eng.on_insert(slots, new)
    live_before = eng._cluster_live.copy()
    kl_before = eng._k_local
    cents_before = eng._centroids.copy()
    eng.refresh()
    assert eng._built and eng._churn == 0 and not eng._overflow
    assert np.array_equal(eng._cluster_live, live_before)
    assert eng._k_local == kl_before
    assert np.array_equal(eng._centroids, cents_before)
    # reserved clusters still hold no rows; live rows in live clusters only
    keep = np.asarray(eng._block_keep)
    assert not keep[~eng._cluster_live].any()
    pos = eng._slot_pos[eng._slot_pos[:, 0] >= 0]
    assert eng._cluster_live[pos[:, 0]].all()
    rng = np.random.default_rng(3)
    q = (new[:32] + 0.05 * rng.normal(size=(32, D))).astype(np.float32)
    assert recall_vs_oracle(store, eng, q) >= 0.9


def test_sharded_topology_roundtrip(mesh):
    store, vecs, eng = make(mesh)
    data = eng.export_topology()
    assert data is not None and bytes(data["kind"]) == b"ivf"
    eng2 = ShardedIVFIndex(
        store, mesh,
        config=IVFConfig(n_probe=8, build_threshold=256, rescore=False),
    )
    eng2.import_topology(data, np.arange(store.capacity))
    assert eng2._built and eng2._k_local == eng._k_local
    q = vecs[:16]
    d1, i1 = eng.search_slots(q, k=5)
    d2, i2 = eng2.search_slots(q, k=5)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_topology_mesh_mismatch_rebuilds(mesh):
    # a sidecar exported under a DIFFERENT shard count must be rejected
    # even when its cluster count happens to divide this mesh (k_local *
    # n_shards != len(cluster_live) -> per-shard ranges and pad sentinels
    # would land on live clusters and silently corrupt results)
    store, vecs, eng = make(mesh, n=4000)
    data = eng.export_topology()
    assert int(data["k_local"]) * 8 == len(data["cluster_live"])
    bad = dict(data)
    bad["k_local"] = np.int64(len(data["cluster_live"]) // 2)  # 2-shard kl
    eng2 = ShardedIVFIndex(
        store, mesh,
        config=IVFConfig(n_probe=8, build_threshold=256, rescore=False),
    )
    eng2.import_topology(bad, np.arange(store.capacity))
    assert eng2._built  # fell back to a fresh build
    assert eng2._k_local * 8 == len(eng2._cluster_live)
    d, i = eng2.search_slots(vecs[:64], k=1)
    assert (i[:, 0] == np.arange(64)).mean() >= 0.98


def test_sharded_rescore_rejected(mesh):
    store = VectorStore(dim=D, metric="euclidean")
    with pytest.raises(ValueError, match="rescore"):
        ShardedIVFIndex(
            store, mesh, config=IVFConfig(rescore=True)
        )


def test_make_engine_kind(mesh):
    from quiver_tpu.index import make_engine

    store = VectorStore(dim=D, metric="euclidean")
    eng = make_engine("sharded_ivf", store, mesh=mesh)
    assert eng.name == "sharded_ivf" and not eng.config.rescore


def test_make_engine_sharded_hybrid_passes_ivf_knobs(mesh):
    # tuning kwargs must reach the IVF side of a sharded hybrid (they were
    # silently dropped); unknown names fail loudly in IVFConfig
    from quiver_tpu.index import make_engine

    store = VectorStore(dim=D, metric="euclidean")
    h = make_engine("sharded_hybrid", store, mesh=mesh, n_probe=5)
    assert h.ann.config.n_probe == 5
    with pytest.raises(TypeError):
        make_engine("sharded_hybrid", store, mesh=mesh, bogus_knob=1)


def test_sharded_skew_auto_raise(mesh):
    """Adversarial probe skew (every query targets clusters one shard owns)
    overflows a too-tight local pair bound; the engine observes the
    mesh-max load on the next dispatch and raises local_pair_factor so
    recall recovers (VERDICT r3 next #7; recorded sweep in
    benches/bench_skew.py: factor=1.0 -> 0.565 recall under skew)."""
    store, vecs, eng = make(mesh, n=5000, n_probe=8)
    eng.local_pair_factor = 1.0
    kl = eng._k_local
    own0 = np.flatnonzero(
        (eng._slot_pos[:, 0] >= 0) & (eng._slot_pos[:, 0] < kl)
    )
    assert len(own0) > 64, "shard 0 owns too few rows for the skew test"
    rng = np.random.default_rng(17)
    q = (vecs[rng.choice(own0, size=256)]
         + 0.05 * rng.normal(size=(256, D))).astype(np.float32)
    r1 = recall_vs_oracle(store, eng, q)  # degraded batch; load stashed
    r2 = recall_vs_oracle(store, eng, q)  # check ran -> bound raised
    assert eng._overflow_raises >= 1
    assert eng.local_pair_factor > 1.0
    assert eng.get_detailed_metrics()["sharded"]["overflow_raises"] >= 1
    assert r2 >= r1 - 1e-9
    assert r2 >= 0.9, (r1, r2, eng.local_pair_factor)


def test_fuzz_sharded_ivf_random_ops(mesh):
    """The cluster-sharded engine under the same random op churn as the
    single-chip engines (tests/test_fuzz_engines.py) — live-recall vs the
    exact oracle, no dead/duplicate slots, refresh/retrain tiers on the
    mesh."""
    from tests.test_fuzz_engines import _run_fuzz

    _run_fuzz(
        lambda s: ShardedIVFIndex(s, mesh, config=IVFConfig(
            n_probe=8, build_threshold=256, rescore=False)),
        seed=400, steps=60,
    )
