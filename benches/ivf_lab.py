"""Shared helpers for the IVF perf lab: the clustered 1M corpus, cached
k-means builds, and tunnel-safe wall timing (fetch-last)."""

import os
import time

import numpy as np

N, D = 1_000_000, 128
N_CENTERS = 1000
DEPTH = 3


def clustered(n=N, seed=0):
    """SIFT-like synthetic corpus: 1000 gaussian blobs (recall on i.i.d.
    gaussian data is trivially high — local structure is what makes the
    problem real)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32), centers, which


def wall(fn, depth=DEPTH):
    """Wall time per call, pipelined: dispatch `depth`, fetch the last
    (block_until_ready is unreliable through the axon tunnel)."""
    outs = [fn() for _ in range(2)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(depth)]
    _ = np.asarray(outs[-1]).ravel()[:1]
    return (time.perf_counter() - t0) / depth


def get_build(vecs, K):
    """K-means build (disk-cached): (centroids, assign, cmax)."""
    cache = f"/tmp/ivf_build_1m_k{K}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["centroids"], z["assign"], int(z["cmax"])
    from quiver_tpu.ops.ivf_kernels import split_oversized, train_kmeans

    valid = np.ones(len(vecs), bool)
    cents, assign = train_kmeans(vecs, valid, K, n_iters=8, seed=0)
    cmax0 = -(-int(1.25 * len(vecs) / K) // 128) * 128
    cents, assign = split_oversized(vecs, cents, assign, cmax0, seed=0)
    counts = np.bincount(assign, minlength=len(cents))
    cmax = -(-int(counts.max()) // 128) * 128
    np.savez(cache, centroids=cents, assign=assign, cmax=cmax)
    return cents, assign, cmax
