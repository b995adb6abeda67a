"""IVF QPS/recall at serving batch sizes with the fused seg epilogue vs the
full-row path; uses the cached 1M build + f64 truth."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.truth import recall_with_ties

N, D, K_TOP = 1_000_000, 128, 10
N_CENTERS = 1000
TRUTH_CACHE = "/tmp/truth_f64_1m.npz"
BUILD_CACHE = "/tmp/ivf_build_1m.npz"
DEPTH = 8


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

    vecs, _, _ = clustered(N)
    rng = np.random.default_rng(1)
    B0 = 2048
    queries = (vecs[:B0] + 0.1 * rng.normal(size=(B0, D))).astype(np.float32)
    z = np.load(TRUTH_CACHE)
    d10 = z["d"][:, K_TOP - 1]

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    dev = store.device_view()

    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=4096, n_probe=8, kmeans_iters=8, build_threshold=1024))
    zb = np.load(BUILD_CACHE)
    eng.import_topology(
        {"kind": np.bytes_(b"ivf"), "centroids": zb["centroids"],
         "assign": zb["assign"], "cmax": zb["cmax"]},
        np.arange(store.capacity))
    K = eng.n_clusters
    print(f"K'={K} Cmax={eng._block_slot.shape[1]}", flush=True)

    P = 8
    cent_j, c_ns = eng._cent_dev
    keep = eng._keep_dev()

    def run(qb, seg, q_cap):
        return ivf_query(
            jnp.asarray(qb), cent_j, c_ns, eng._blocks, eng._block_slot,
            eng._block_ns, eng._block_inv, keep, dev.vectors,
            metric="euclidean", k=K_TOP, n_probe=P, q_cap=q_cap,
            compute_dtype=eng.compute_dtype,
            oversample=eng.config.oversample,
            probe_approx=eng.config.probe_approx,
            probe_sel_approx=eng.config.probe_sel_approx, seg=seg)

    def timed(fn, depth=DEPTH):
        outs = [fn() for _ in range(2)]
        _ = np.asarray(outs[-1][0]).ravel()[:1]
        t0 = time.perf_counter()
        outs = [fn() for _ in range(depth)]
        _ = np.asarray(outs[-1][0]).ravel()[:1]
        return (time.perf_counter() - t0) / depth

    for B in (2048, 8192, 16384, 32768):
        reps = max(1, B // B0)
        qb = np.concatenate([
            queries if r == 0 else
            (queries + 0.01 * np.random.default_rng(100 + r).normal(
                size=queries.shape)).astype(np.float32)
            for r in range(reps)
        ])[:B]
        q_cap = eng._q_cap(B, P, K)
        for seg in (16, None):
            d, i = run(qb, seg, q_cap)
            rec = recall_with_ties(
                np.asarray(i)[:B0], queries, vecs, d10, K_TOP)
            dt = timed(lambda: run(qb, seg, q_cap))
            print(f"B={B:6d} seg={str(seg):5s} q_cap={q_cap:4d}: "
                  f"{dt*1e3:8.2f} ms = {B/dt:12,.0f} QPS  "
                  f"true recall {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
