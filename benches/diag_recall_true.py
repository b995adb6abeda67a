"""Re-measure flat-scan and IVF recall against tie-aware f64 ground truth
(benches/truth.py) on the 1M clustered corpus."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.truth import exact_truth_f64, recall_with_ties

N, D, B, K_TOP = 1_000_000, 128, 2048, 10
N_CENTERS = 1000
TRUTH_CACHE = "/tmp/truth_f64_1m.npz"
BUILD_CACHE = "/tmp/ivf_build_1m.npz"


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32), centers, which


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.ivf_kernels import ivf_query
    from quiver_tpu.ops.scan import flat_scan_topk

    vecs, centers, which = clustered(N)
    rng = np.random.default_rng(1)
    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)

    if os.path.exists(TRUTH_CACHE):
        z = np.load(TRUTH_CACHE)
        t_idx, t_d = z["idx"], z["d"]
    else:
        t0 = time.perf_counter()
        t_idx, t_d = exact_truth_f64(queries, vecs, K_TOP)
        np.savez(TRUTH_CACHE, idx=t_idx, d=t_d)
        print(f"f64 truth computed in {time.perf_counter()-t0:.1f}s", flush=True)
    d10 = t_d[:, K_TOP - 1]

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    dev = store.device_view()
    qd = jnp.asarray(queries)
    corpus16 = dev.vectors.astype(jnp.bfloat16)

    # flat scan bf16 + approx (the current headline configuration)
    _, i_flat = flat_scan_topk(
        qd, corpus16, dev.valid, None, dev.norms_sq, dev.inv_norms,
        metric="euclidean", k=K_TOP, tile=dev.vectors.shape[0],
        compute_dtype=jnp.bfloat16, approx_recall=0.95)
    r = recall_with_ties(np.asarray(i_flat), queries, vecs, d10, K_TOP)
    print(f"flat bf16+approx0.95 true recall: {r:.4f}", flush=True)

    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=4096, n_probe=8, kmeans_iters=8, build_threshold=1024))
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": z["assign"], "cmax": z["cmax"]},
            np.arange(store.capacity))
        print("ivf build loaded from cache", flush=True)
    else:
        eng.build()
    K = eng.n_clusters

    for P in (2, 4, 8, 16):
        q_cap = eng._q_cap(B, P, K)
        _, i_ivf = ivf_query(
            qd, *eng._cent_dev, eng._blocks, eng._block_slot,
            eng._block_ns, eng._block_inv, eng._keep_dev(), dev.vectors,
            metric="euclidean", k=K_TOP, n_probe=P, q_cap=q_cap,
            compute_dtype=eng.compute_dtype,
            oversample=eng.config.oversample,
            probe_approx=eng.config.probe_approx,
            probe_sel_approx=eng.config.probe_sel_approx)
        r = recall_with_ties(np.asarray(i_ivf), queries, vecs, d10, K_TOP)
        print(f"IVF P={P:3d} q_cap={q_cap:4d} true recall: {r:.4f}", flush=True)


if __name__ == "__main__":
    main()
