"""Tunnel-immune DEVICE time of the full ivf_query at serving shapes:
repeat the kernel L times inside one jitted lax.scan (query perturbed by
the carry so iterations serialize); slope = device ms per call."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, K_TOP = 1_000_000, 128, 10
N_CENTERS = 1000
BUILD_CACHE = "/tmp/ivf_build_1m.npz"
LO, HI, DEPTH = 1, 5, 3


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32), centers, which


def wall(fn, depth=DEPTH):
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops import ivf_kernels

    vecs, _, _ = clustered(N)
    rng = np.random.default_rng(1)

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
    cent_j, c_ns = eng._cent_dev
    keep = eng._keep_dev()
    print(f"K'={K} Cmax={eng._block_slot.shape[1]}", flush=True)

    P = 8
    # unjitted kernel body for embedding in the scan
    body = ivf_kernels.ivf_query.__wrapped__

    for B in (2048, 8192, 16384):
        q = jnp.asarray(vecs[:B] + 0.1 * np.random.default_rng(1).normal(
            size=(B, D)).astype(np.float32))
        q_cap = eng._q_cap(B, P, K)
        for seg in (16, None):
            @partial(jax.jit, static_argnames=("L",))
            def loop(c, q, blocks, bslot, bns, binv, keep, sv, cent_j, c_ns,
                     *, L, seg=seg, q_cap=q_cap):
                def step(c, _):
                    d, i = body(
                        q + c, cent_j, c_ns, blocks, bslot, bns, binv,
                        keep, sv,
                        metric="euclidean", k=K_TOP, n_probe=P, q_cap=q_cap,
                        compute_dtype=jnp.bfloat16, oversample=4,
                        probe_approx=0.98, probe_sel_approx=0.99, seg=seg)
                    return c + d[0, 0] * 1e-30, None
                c, _ = jax.lax.scan(step, c, None, length=L)
                return c

            res = {}
            for L in (LO, HI):
                res[L] = wall(lambda L=L: loop(
                    jnp.float32(0), q, eng._blocks, eng._block_slot,
                    eng._block_ns, eng._block_inv, keep, dev.vectors,
                    cent_j, c_ns, L=L)) * 1e3
            dms = (res[HI] - res[LO]) / (HI - LO)
            print(f"B={B:6d} seg={str(seg):5s} q_cap={q_cap:4d}: "
                  f"device {dms:8.2f} ms = {B/dms*1e3:12,.0f} QPS  "
                  f"(wall L1 {res[LO]:7.1f})", flush=True)


if __name__ == "__main__":
    main()
