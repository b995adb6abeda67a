"""Fused-Pallas vs pairs formulation A/B at the small-B/high-P niche
(VERDICT r3 next #8: win somewhere measurable or be deleted).

Round-3 state: fused loses ~1.7x at the headline shape (B=16k, P=3-4).
The plausible remaining niche is small batches with many probes, where
the pairs path's per-pair gathers amortize worst. Grid: B x P over the
cached 1M build, chained device walls (pipelined fetch-last).

Usage: python benches/exp_fused_ab.py [B ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.common import emit
from benches.ivf_lab import clustered, get_build, wall

N, D, K_TOP = 1_000_000, 128, 10


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.ivf_kernels import ivf_query

    Bs = [int(x) for x in sys.argv[1:]] or [256, 2048]
    Ps = [int(x) for x in os.environ.get("QUIVER_AB_PS", "4 8 16").split()]
    vecs, _, _ = clustered(N)
    cents, assign, cmax = get_build(vecs, 1024)
    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    eng = IVFIndex(store, config=IVFConfig(
        n_probe=4, kmeans_iters=8, build_threshold=1024, rescore=False))
    eng.import_topology(
        {"kind": np.bytes_(b"ivf"), "centroids": cents, "assign": assign,
         "cmax": np.int64(cmax)}, np.arange(store.capacity))
    dev = store.device_view()
    cent_j, c_ns = eng._cent_dev
    keep = eng._keep_dev()
    rng = np.random.default_rng(5)

    for B in Bs:
        q = jnp.asarray(
            (vecs[rng.integers(0, N, B)]
             + 0.1 * rng.normal(size=(B, D))).astype(np.float32))
        for P in Ps:
            row = {}
            for form in ("pairs", "fused"):
                def run(form=form, q=q, P=P):
                    d, _ = ivf_query(
                        q, cent_j, c_ns, eng._blocks_t, eng._block_slot,
                        eng._block_ns, eng._block_inv, keep, dev.vectors,
                        metric="euclidean", k=K_TOP, n_probe=P, q_cap=8,
                        formulation=form,
                        oversample=eng.config.oversample,
                        probe_approx=eng.config.probe_approx,
                        probe_sel_approx=eng.config.probe_sel_approx,
                        seg_width=eng.config.seg_width, rescore=False)
                    return d
                try:
                    # best-of-3 pipelined walls: single samples over the
                    # tunnel scatter +-20% (observed non-monotone P sweeps)
                    row[form] = min(wall(run, depth=8) for _ in range(3))
                except Exception as e:  # noqa: BLE001 — record and move on
                    print(f"# {form} B={B} P={P} failed: {e}", flush=True)
                    row[form] = float("nan")
            emit(f"ivf fused-vs-pairs, B={B} P={P} (1M x {D}-d)",
                 row["pairs"] * 1e3, "ms/batch pairs",
                 fused_ms=round(row["fused"] * 1e3, 3),
                 fused_over_pairs=round(row["fused"] / row["pairs"], 3))


if __name__ == "__main__":
    main()
