"""Hybrid index + adaptive selector tests (reference:
pkg/hybrid/adaptive_test.go threshold/strategy behavior,
hybrid_index_test.go routing + consistency)."""

import numpy as np
import pytest

from quiver_tpu.core.store import VectorStore
from quiver_tpu.index.exact import ExactIndex
from quiver_tpu.index.hybrid import (
    EXACT,
    HNSW,
    AdaptiveConfig,
    AdaptiveStrategySelector,
    HybridIndex,
    QueryMetric,
)

D = 16


def no_explore(**kw):
    kw.setdefault("exploration_factor", 0.0)
    return AdaptiveConfig(**kw)


def test_small_corpus_selects_exact():
    s = AdaptiveStrategySelector(no_explore())
    assert s.select_strategy(500, 64, 10) == EXACT


def test_large_corpus_selects_hnsw():
    s = AdaptiveStrategySelector(no_explore())
    assert s.select_strategy(100_000, 64, 10) == HNSW


def test_high_dim_large_k_selects_exact():
    # dim > threshold and k >= 50 -> exact (adaptive.go:41-72)
    s = AdaptiveStrategySelector(no_explore())
    assert s.select_strategy(100_000, 512, 64) == EXACT
    assert s.select_strategy(100_000, 512, 10) == HNSW


def test_exploration_randomizes():
    s = AdaptiveStrategySelector(AdaptiveConfig(exploration_factor=1.0, seed=7))
    seen = {s.select_strategy(10, 8, 5) for _ in range(50)}
    assert seen == {EXACT, HNSW}


def test_threshold_adaptation_moves_toward_faster_engine():
    cfg = no_explore(adapt_every=20, min_samples=10)
    s = AdaptiveStrategySelector(cfg)
    t0 = s.exact_threshold
    # exact consistently faster on small corpora -> threshold grows
    for i in range(40):
        strat = EXACT if i % 2 == 0 else HNSW
        lat = 1.0 if strat == EXACT else 5.0
        s.record_query_metrics(QueryMetric(strat, lat, 10, corpus_size=800))
    assert s.exact_threshold > t0
    # now hnsw consistently faster -> threshold shrinks (floor 100)
    s2 = AdaptiveStrategySelector(cfg)
    for i in range(40):
        strat = EXACT if i % 2 == 0 else HNSW
        lat = 5.0 if strat == EXACT else 1.0
        s2.record_query_metrics(QueryMetric(strat, lat, 10, corpus_size=800))
    assert s2.exact_threshold < t0
    # floor
    for _ in range(200):
        for i in range(20):
            strat = EXACT if i % 2 == 0 else HNSW
            lat = 5.0 if strat == EXACT else 1.0
            s2.record_query_metrics(QueryMetric(strat, lat, 10, corpus_size=800))
    assert s2.exact_threshold >= 100


def build_hybrid(n=300, **kw):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    store = VectorStore(dim=D, metric="euclidean")
    idx = HybridIndex(store, build_batch=128, **kw)
    slots = store.add_batch([f"v{i}" for i in range(n)], vecs)
    idx.on_insert(slots, vecs)
    return store, idx, vecs


def test_batch_mixed_per_query_strategies():
    # full exploration: every query draws its own engine (reference
    # BatchSearch picks per query, hybrid_index.go:702-795); the stitched
    # batch must still return each query's own nearest row
    store, idx, vecs = build_hybrid(
        n=400,
        adaptive_config=AdaptiveConfig(exploration_factor=1.0, seed=3),
    )
    d, slots = idx.search_slots(vecs[:64], k=3)
    assert (slots[:, 0] == np.arange(64)).mean() >= 0.95
    counts = idx._per_strategy_counts
    assert counts[EXACT] > 0 and counts[HNSW] > 0  # both engines exercised
    assert counts[EXACT] + counts[HNSW] == 64
    # selector window got per-query metrics, not one per batch
    assert len(idx.selector._window) == 64


def test_batch_uniform_when_not_exploring():
    store, idx, vecs = build_hybrid(
        n=200, adaptive_config=no_explore(initial_exact_threshold=1000)
    )
    d, slots = idx.search_slots(vecs[:16], k=2)
    assert idx._per_strategy_counts[HNSW] == 0  # one engine, one kernel


def test_hybrid_small_routes_exact():
    store, idx, vecs = build_hybrid(
        n=200, adaptive_config=no_explore(initial_exact_threshold=1000)
    )
    _, slots = idx.search_slots(vecs[:2], k=5)
    assert idx.last_strategy == EXACT
    assert store.id_of(int(slots[0, 0])) == "v0"


def test_hybrid_large_routes_hnsw():
    store, idx, vecs = build_hybrid(
        n=300, adaptive_config=no_explore(initial_exact_threshold=10)
    )
    _, slots = idx.search_slots(vecs[:2], k=5)
    assert idx.last_strategy == HNSW
    assert store.id_of(int(slots[0, 0])) == "v0"


def test_forced_exact_overrides_selector():
    store, idx, vecs = build_hybrid(
        n=300, adaptive_config=no_explore(initial_exact_threshold=10)
    )
    idx.search_slots(vecs[:1], k=5, exact=True)
    assert idx.last_strategy == EXACT


def test_masked_queries_route_exact():
    import jax.numpy as jnp

    store, idx, vecs = build_hybrid(
        n=300, adaptive_config=no_explore(initial_exact_threshold=10)
    )
    mask = np.zeros(store.capacity, bool)
    mask[store.slot_of("v9")] = True
    _, slots = idx.search_slots(vecs[:1], k=3, mask=jnp.asarray(mask))
    assert idx.last_strategy == EXACT
    assert store.id_of(int(slots[0, 0])) == "v9"


def test_both_strategies_agree_on_top1():
    store, idx, vecs = build_hybrid(n=400)
    _, e = idx.search_slots(vecs[:8], k=1, strategy=EXACT)
    _, h = idx.search_slots(vecs[:8], k=1, strategy=HNSW)
    agree = (e[:, 0] == h[:, 0]).mean()
    assert agree >= 0.9


def test_writes_propagate_to_graph():
    store, idx, vecs = build_hybrid(
        n=300, adaptive_config=no_explore(initial_exact_threshold=10)
    )
    slot = store.slot_of("v3")
    store.delete("v3")
    idx.on_delete(np.asarray([slot]))
    _, slots = idx.search_slots(vecs[3][None], k=10, strategy=HNSW)
    ids = {store.id_of(int(s)) for s in slots[0] if s >= 0}
    assert "v3" not in ids


def test_stats_shape():
    store, idx, vecs = build_hybrid(n=120)
    idx.search_slots(vecs[:1], k=3)
    st = idx.stats()
    assert "selector" in st and "per_strategy_queries" in st
    assert st["selector"]["exact_threshold"] > 0


def test_optimization_parameters_surface():
    store, idx, _ = build_hybrid(n=120)
    p = idx.get_optimization_parameters()
    assert p["ef_search"] == 100 and p["m"] == 16
    idx.set_optimization_parameters(ef_search=64)
    assert idx.get_optimization_parameters()["ef_search"] == 64
    with pytest.raises(ValueError, match="immutable"):
        idx.set_optimization_parameters(m=8)
    with pytest.raises(ValueError, match="positive"):
        idx.set_optimization_parameters(ef_search=0)
    dm = idx.get_detailed_metrics()
    assert "hnsw" in dm and dm["hnsw"]["size"] == 120


def test_optimization_knobs_of_other_backend_are_noop():
    # the reference-parity EfSearch call must not explode when the auto
    # backend resolved to IVF (and vice versa) — it is a no-op there
    store = VectorStore(dim=D, metric="euclidean")
    vecs = np.random.default_rng(0).normal(size=(300, D)).astype(np.float32)
    slots = store.add_batch([f"v{i}" for i in range(300)], vecs)
    ivf_h = HybridIndex(store)  # auto -> ivf
    ivf_h.on_insert(slots, vecs)
    assert ivf_h.ann_label == "ivf"
    ivf_h.set_optimization_parameters(ef_search=64)  # graph knob: no-op
    ivf_h.set_optimization_parameters(n_probe=4)
    assert ivf_h.get_optimization_parameters()["n_probe"] == 4
    hnsw_h = HybridIndex(store, ann_backend="hnsw", build_batch=256)
    hnsw_h.set_optimization_parameters(n_probe=4)  # ivf knob: no-op
    hnsw_h.set_optimization_parameters(ef_search=32)
    assert hnsw_h.get_optimization_parameters()["ef_search"] == 32
    with pytest.raises(ValueError, match="immutable or unknown"):
        hnsw_h.set_optimization_parameters(bogus=1)


def test_fluent_strategy_and_stats():
    import numpy as np
    from quiver_tpu.core.collection import Collection
    from quiver_tpu.index.hybrid import HybridIndex

    rng = np.random.default_rng(0)
    c = Collection("fl", 8, "euclidean",
                   engine_factory=lambda s: HybridIndex(s, build_batch=64,
                                                        adaptive_config=no_explore()))
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    c.add_batch([f"v{i}" for i in range(50)], vecs)
    resp = (c.fluent_search(vecs[0]).with_k(3).with_strategy("exact")
            .include_stats().execute())
    assert resp.results[0].id == "v0"
    assert resp.metadata.strategy == "exact"
    assert resp.metadata.engine_stats is not None
    with pytest.raises(ValueError, match="unknown strategy"):
        c.fluent_search(vecs[0]).with_strategy("bogus").execute()


def test_hybrid_ivf_backend_routes_and_matches_exact():
    """ann_backend="ivf": the hybrid's ANN side is the IVF engine; routed
    queries agree with the exact oracle at high n_probe."""
    from quiver_tpu.index.hybrid import HybridIndex
    from quiver_tpu.index.ivf import IVFConfig

    rng = np.random.default_rng(11)
    n, dim, k = 4096, 32, 10
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    store = VectorStore(dim=dim, metric="euclidean", capacity=n)
    idx = HybridIndex(
        store, ann_backend="ivf",
        ivf_config=IVFConfig(n_probe=32, build_threshold=512),
        adaptive_config=AdaptiveConfig(
            exploration_factor=0.0, initial_exact_threshold=100),
    )
    slots = store.add_batch([f"v{i}" for i in range(n)], vecs)
    idx.on_insert(slots, vecs)
    q = (vecs[:16] + 0.05 * rng.normal(size=(16, dim))).astype(np.float32)
    d, s = idx.search_slots(q, k)
    assert idx.last_strategy == "ivf"  # label names the engine that ran
    assert idx.stats()["per_strategy_queries"].get("ivf", 0) >= 1
    de, se = idx.exact.search_slots(q, k)
    rec = np.mean([len(set(s[b]) & set(se[b])) / k for b in range(16)])
    assert rec >= 0.9


def test_default_ann_backend_resolves_to_ivf():
    """Out-of-box HybridIndex (no graph kwargs) serves the IVF engine —
    the DBOptions() default experience (VERDICT r2 missing #2/#4)."""
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    rng = np.random.default_rng(5)
    n, dim, k = 2048, 32, 5
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    store = VectorStore(dim=dim, metric="euclidean", capacity=n)
    idx = HybridIndex(
        store,
        ivf_config=IVFConfig(n_probe=16, build_threshold=512),
        adaptive_config=no_explore(initial_exact_threshold=100),
    )
    assert idx.ann_backend == "ivf" and isinstance(idx.ann, IVFIndex)
    slots = store.add_batch([f"v{i}" for i in range(n)], vecs)
    idx.on_insert(slots, vecs)
    _, s = idx.search_slots(vecs[:8], k)
    assert idx.last_strategy == "ivf"
    assert (s[:, 0] == np.arange(8)).mean() >= 0.8
    # an explicit graph kwarg flips the resolution to the graph
    store2 = VectorStore(dim=dim, metric="euclidean")
    idx2 = HybridIndex(store2, build_batch=128)
    assert idx2.ann_backend == "hnsw"


def test_recall_shortfall_routes_to_exact():
    """An ANN engine whose recall-target tuner measured itself short of
    target at the probe ceiling is bypassed: hybrid `auto` serves exact
    (the uniform/heavy-tail corpus-robustness families,
    benches/bench_corpus_matrix.py)."""
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    rng = np.random.default_rng(11)
    n, dim, k = 4096, 32, 5
    vecs = rng.normal(size=(n, dim)).astype(np.float32)  # uniform: no structure
    store = VectorStore(dim=dim, metric="euclidean", capacity=n)
    store.add_batch([f"v{i}" for i in range(n)], vecs)
    eng = IVFIndex(store, config=IVFConfig(
        n_probe=1, n_probe_max=2, recall_target=0.99, build_threshold=512))
    eng.build()
    assert eng.recall_shortfall  # 2 probes can't reach 0.99 on uniform data
    idx = HybridIndex(
        store,
        adaptive_config=no_explore(initial_exact_threshold=100),
        ann_factory=lambda s: eng,
    )
    idx._graph_built = True
    _, s = idx.search_slots(vecs[:16], k)
    assert idx.last_strategy == EXACT
    assert (s[:, 0] == np.arange(16)).all()  # exact: perfect self-recall
    # a healthy tuner outcome keeps the ANN route
    eng._tuned_recall = 1.0
    assert not eng.recall_shortfall
    _, _ = idx.search_slots(vecs[:16], k)
    assert idx.last_strategy == "ivf"
