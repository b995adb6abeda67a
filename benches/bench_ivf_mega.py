"""IVF engine QPS/recall at serving batch sizes — drives IVFIndex (the
real engine path) over the cached 1M build; sweeps config knobs in ONE
process so comparisons dodge cross-process chip variance.

Usage: python benches/bench_ivf_mega.py [B ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.ivf_lab import clustered, get_build
from benches.truth import recall_with_ties

N, D, K_TOP = 1_000_000, 128, 10
TRUTH_CACHE = "/tmp/truth_f64_1m.npz"
DEPTH = 8


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    Bs = [int(x) for x in sys.argv[1:]] or [2048, 16384]
    vecs, _, _ = clustered(N)
    rng = np.random.default_rng(1)
    B0 = 2048
    queries = (vecs[:B0] + 0.1 * rng.normal(size=(B0, D))).astype(np.float32)
    if os.path.exists(TRUTH_CACHE):
        z = np.load(TRUTH_CACHE)
        d10 = z["d"][:, K_TOP - 1]
    else:  # cold /tmp: compute the oracle instead of crashing
        from benches.truth import exact_truth_f64

        print("# computing f64 truth (cold cache, ~minutes)", flush=True)
        idx_t, d_t = exact_truth_f64(queries, vecs, K_TOP)
        np.savez(TRUTH_CACHE, i=idx_t, d=d_t)
        d10 = d_t[:, K_TOP - 1]

    cents, assign, cmax = get_build(vecs, 1024)
    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)

    def make_engine(**cfg):
        eng = IVFIndex(store, config=IVFConfig(
            n_probe=8, kmeans_iters=8, build_threshold=1024, **cfg))
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": cents,
             "assign": assign, "cmax": np.int64(cmax)},
            np.arange(store.capacity))
        print(f"engine ready K'={eng.n_clusters} "
              f"Cmax={eng._block_slot.shape[1]}", flush=True)
        return eng

    def timed(fn, depth=DEPTH):
        outs = [fn() for _ in range(2)]
        _ = np.asarray(outs[-1][0]).ravel()[:1]
        t0 = time.perf_counter()
        outs = [fn() for _ in range(depth)]
        _ = np.asarray(outs[-1][0]).ravel()[:1]
        return (time.perf_counter() - t0) / depth

    # pairs (the serving default) vs the fused Pallas kernel across the
    # clusters-per-grid-cell knob (VERDICT r2 next-#1a: amortize the fixed
    # per-cell cost); KG variants too big for scoped VMEM just report and
    # continue
    configs = [
        dict(rescore=False, n_probe=3, q_cap_factor=2, seg_width=32,
             formulation="pairs"),
        dict(rescore=False, n_probe=3, q_cap_factor=2, seg_width=32,
             formulation="fused", fused_kg=1),
        dict(rescore=False, n_probe=3, q_cap_factor=2, seg_width=32,
             formulation="fused", fused_kg=2),
        dict(rescore=False, n_probe=3, q_cap_factor=2, seg_width=32,
             formulation="fused", fused_kg=4),
        dict(rescore=False, n_probe=3, q_cap_factor=2, seg_width=32,
             formulation="fused", fused_kg=8),
        dict(rescore=False, n_probe=4, q_cap_factor=2, seg_width=32,
             formulation="pairs"),
        dict(rescore=False, n_probe=4, q_cap_factor=2, seg_width=32,
             formulation="fused", fused_kg=4),
    ]
    eng = make_engine()
    for cfg in configs:
        for k2, v2 in cfg.items():
            setattr(eng.config, k2, v2)
        for B in Bs:
            reps = -(-B // B0)  # ceil: qb must really hold B rows
            qb = np.concatenate([
                queries if r == 0 else
                (queries + 0.01 * np.random.default_rng(100 + r).normal(
                    size=queries.shape)).astype(np.float32)
                for r in range(reps)
            ])[:B]
            qj = jnp.asarray(qb)
            try:
                d, i = eng.search_slots_device(qj, K_TOP)
                rec = recall_with_ties(
                    np.asarray(i)[:B0], queries, vecs, d10, K_TOP)
                dt = timed(lambda: eng.search_slots_device(qj, K_TOP))
            except Exception as e:  # scoped-VMEM OOM at big KG, etc.
                print(f"{cfg} B={B:6d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                continue
            print(f"{cfg} B={B:6d}: {dt*1e3:8.2f} ms = "
                  f"{B/dt:12,.0f} QPS  true recall {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
