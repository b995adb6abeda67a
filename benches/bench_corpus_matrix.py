"""Recall-vs-corpus-family matrix (VERDICT r4 #5).

BASELINE.json's north star names SIFT-1M; this environment has zero
egress, so the honest substitute is a robustness matrix: corpus families
chosen to break the regimes synthetic gaussian clusters flatter, each run
through the SAME engine configuration with the recall-target tuner
(IVFConfig.recall_target) — the claim under test is the tuner's
"transfers to any corpus" (index/ivf.py), i.e. the engine meets the 0.95
gate on every family at whatever n_probe it picks, not that one
hand-tuned constant survives.

Families (all N x 128-d euclidean, queries = corpus rows + 0.1 sigma
jitter, tie-aware recall vs an exact f64 oracle — benches/truth.py):
  clustered    : isotropic gaussian blobs (the headline's family)
  anisotropic  : blobs stretched 10:1 along random axes (probe geometry
                 mismatches the cluster shape)
  heavy-tail   : Zipf-distributed blob sizes (one giant cluster overflows
                 cmax and splits; tiny ones waste probes)
  near-dup     : 30% of rows are near-duplicates (ties stress the
                 tie-aware counting and the bf16 ranking noise)
  uniform      : i.i.d. gaussian, no structure at all (worst case for
                 IVF pruning — centroids carry no information)
"""

import os

import numpy as np

from benches.common import emit, env_int

N = env_int("QUIVER_BENCH_MATRIX_N", 250_000)
D, K_TOP = 128, 10
B_ORACLE = 1024
TARGET = 0.95


def family_clustered(rng, n):
    centers = rng.normal(size=(max(32, n // 1000), D)).astype(np.float32)
    which = rng.integers(0, len(centers), n)
    return centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)


def family_anisotropic(rng, n):
    k = max(32, n // 1000)
    centers = rng.normal(size=(k, D)).astype(np.float32)
    # per-cluster random stretch: 10:1 between the largest and smallest axis
    scales = rng.uniform(0.05, 0.5, size=(k, D)).astype(np.float32)
    which = rng.integers(0, k, n)
    return centers[which] + scales[which] * rng.normal(
        size=(n, D)).astype(np.float32)


def family_heavy_tail(rng, n):
    k = max(64, n // 2000)
    centers = rng.normal(size=(k, D)).astype(np.float32)
    p = 1.0 / np.arange(1, k + 1) ** 1.5  # Zipf cluster sizes
    p /= p.sum()
    which = rng.choice(k, size=n, p=p)
    return centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)


def family_near_dup(rng, n):
    base = family_clustered(rng, n - n // 3)
    dups = base[rng.integers(0, len(base), n // 3)] + 1e-4 * rng.normal(
        size=(n // 3, D)).astype(np.float32)
    return np.concatenate([base, dups])


def family_uniform(rng, n):
    return rng.normal(size=(n, D)).astype(np.float32)


FAMILIES = [
    ("clustered", family_clustered),
    ("anisotropic", family_anisotropic),
    ("heavy-tail", family_heavy_tail),
    ("near-dup", family_near_dup),
    ("uniform", family_uniform),
]

# comma list to re-run a subset after an engine change without paying the
# other families' builds (mirrors bench_streaming's QUIVER_BENCH_ENGINES)
_SEL = os.environ.get("QUIVER_BENCH_FAMILIES")
if _SEL:
    keep = {s.strip() for s in _SEL.split(",")}
    FAMILIES = [f for f in FAMILIES if f[0] in keep]


def main():
    from benches.truth import exact_truth_f64, recall_with_ties
    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.hybrid import AdaptiveConfig, HybridIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    import zlib

    for name, gen in FAMILIES:
        # crc32, not hash(): str hashes are per-process salted
        rng = np.random.default_rng(zlib.crc32(name.encode()))
        vecs = np.ascontiguousarray(gen(rng, N), np.float32)
        queries = (vecs[rng.integers(0, N, B_ORACLE)]
                   + 0.1 * vecs.std(axis=0, keepdims=True)
                   * rng.standard_normal((B_ORACLE, D))).astype(np.float32)

        store = VectorStore(dim=D, metric="euclidean", capacity=N)
        store.add_batch([f"v{i}" for i in range(N)], vecs)
        eng = IVFIndex(store, config=IVFConfig(
            q_cap_factor=2, kmeans_iters=8, build_threshold=1024,
            rescore=False, recall_target=TARGET))
        eng.build()

        d10 = exact_truth_f64(queries, vecs, K_TOP)[1][:, K_TOP - 1]
        _, got = eng.search_slots(queries, K_TOP)
        recall = recall_with_ties(
            np.asarray(got), queries, vecs, d10, K_TOP)
        emit(
            f"corpus-matrix {name} N={N} [ivf]", recall, "recall@10",
            tuned_n_probe=eng.config.n_probe,
            tuner_holdout=round(eng._tuned_recall or -1, 4),
            holdout_gap=round((eng._tuned_recall or 0) - recall, 4),
            n_clusters=eng.n_clusters,
            recall_shortfall=bool(eng.recall_shortfall),
            meets_target=bool(recall >= TARGET),
        )

        # the product surface: hybrid `auto` — the recall-aware route
        # (IVF at its tuned n_probe, or exact when the tuner measured a
        # shortfall at the probe ceiling). Injects the already-built
        # engine so the row measures routing, not a second build.
        hyb = HybridIndex(
            store,
            adaptive_config=AdaptiveConfig(exploration_factor=0.0),
            ann_factory=lambda s: eng,
        )
        hyb._graph_built = True
        _, got_h = hyb.search_slots(queries, K_TOP)
        recall_h = recall_with_ties(
            np.asarray(got_h), queries, vecs, d10, K_TOP)
        emit(
            f"corpus-matrix {name} N={N} [hybrid auto]", recall_h,
            "recall@10",
            engine=hyb.last_strategy,
            meets_target=bool(recall_h >= TARGET),
        )
        del eng, hyb, store, vecs
        import gc

        import jax

        gc.collect()
        jax.clear_caches()


if __name__ == "__main__":
    main()
