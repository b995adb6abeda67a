"""Diagnose the IVF recall ceiling (~0.94 at n_probe=8-16 on the clustered
1M corpus): toggle each approximation knob independently and report recall,
plus ground-truth coverage stats (are the true top-10 in probed clusters at
all? how many pairs drop at q_cap?)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, B, K_TOP = 1_000_000, 128, 2048, 10
N_CENTERS = 1000
ORACLE_CACHE = "/tmp/ivf_oracle_1m.npy"


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32), centers, which


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.ivf_kernels import ivf_query

    vecs, centers, which = clustered(N)
    rng = np.random.default_rng(1)
    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
    oracle = np.load(ORACLE_CACHE)
    qd = jnp.asarray(queries)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    dev = store.device_view()

    t0 = time.perf_counter()
    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=4096, n_probe=8, kmeans_iters=8, build_threshold=1024))
    eng.build()
    K = eng.n_clusters
    Cmax = eng._block_slot.shape[1]
    print(f"build {time.perf_counter()-t0:.1f}s K'={K} Cmax={Cmax}", flush=True)

    # ---- ground-truth coverage: fraction of true top-10 whose cluster is
    # among each query's top-P centroids (the pure IVF structural ceiling)
    slot_cluster = eng._slot_pos[:, 0]  # [cap]
    cent = eng._centroids
    c_aff = 2.0 * (queries @ cent.T) - np.sum(cent * cent, axis=1)[None, :]
    order = np.argsort(-c_aff, axis=1)
    truth_cl = slot_cluster[oracle]  # [B, 10]
    for P in (4, 8, 16, 32):
        topP = order[:, :P]  # [B, P]
        hit = np.zeros(oracle.shape, bool)
        for b in range(B):
            hit[b] = np.isin(truth_cl[b], topP[b])
        print(f"structural ceiling P={P:3d}: {hit.mean():.4f}", flush=True)

    # ---- q_cap drop count at P=8
    P = 8
    q_cap = eng._q_cap(B, P, K)
    topP = order[:, :P]
    loads = np.bincount(topP.reshape(-1), minlength=K)
    dropped = np.maximum(loads - q_cap, 0).sum()
    print(f"q_cap={q_cap} max load={loads.max()} dropped pairs={dropped} "
          f"/ {B*P}", flush=True)

    def run(**kw):
        args = dict(metric="euclidean", k=K_TOP, n_probe=P,
                    q_cap=q_cap, compute_dtype=eng.compute_dtype,
                    oversample=eng.config.oversample,
                    probe_approx=eng.config.probe_approx,
                    probe_sel_approx=eng.config.probe_sel_approx)
        args.update(kw)
        d, i = ivf_query(
            qd, *eng._cent_dev, eng._blocks, eng._block_slot,
            eng._block_ns, eng._block_inv, eng._keep_dev(), dev.vectors,
            **args)
        i = np.asarray(i)
        rec = np.mean([
            len(set(i[b].tolist()) & set(oracle[b].tolist())) / K_TOP
            for b in range(B)
        ])
        return rec

    print(f"default:                      {run():.4f}", flush=True)
    print(f"probe_approx=None:            {run(probe_approx=None):.4f}", flush=True)
    print(f"probe_sel_approx=None:        {run(probe_sel_approx=None):.4f}", flush=True)
    print(f"q_cap x4:                     {run(q_cap=4*q_cap):.4f}", flush=True)
    print(f"oversample=16:                {run(oversample=16):.4f}", flush=True)
    print(f"all exact + q_cap x4 + ovs16: "
          f"{run(probe_approx=None, probe_sel_approx=None, q_cap=4*q_cap, oversample=16):.4f}",
          flush=True)
    print(f"f32 compute:                  {run(compute_dtype=jnp.float32):.4f}", flush=True)


if __name__ == "__main__":
    main()
