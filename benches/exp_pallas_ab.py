"""Wire-or-delete measurement for ops/pallas_scan.py (VERDICT r2 #9).

A/B in ONE process, interleaved: XLA flat_scan_topk vs pallas_scan_topk
at exact-serving shapes. Pipelined fetch-last timing.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from quiver_tpu.ops.scan import flat_scan_topk
from quiver_tpu.ops.pallas_scan import pallas_scan_topk
from quiver_tpu.ops.distance import norms_sq, inv_norms

rng = np.random.default_rng(0)
N, D, K = 1 << 20, 128, 10  # pow2: both scans tile the corpus at 32768
v = rng.normal(size=(N, D)).astype(np.float32)
vj = jnp.asarray(v)
ns = norms_sq(vj)
inv = inv_norms(ns)
valid = jnp.ones((N,), bool)

for B in (256, 1024):
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def run_flat():
        return flat_scan_topk(q, vj, valid, None, ns, inv,
                              metric="euclidean", k=K, tile=32768,
                              compute_dtype=jnp.bfloat16,
                              approx_recall=0.95)

    def run_pal():
        return pallas_scan_topk(q, vj, valid, None, ns, inv,
                                metric="euclidean", k=K, tile=32768,
                                compute_dtype=jnp.bfloat16)

    # warm both
    df, idf = run_flat(); _ = np.asarray(idf[0, 0])
    dp, idp = run_pal(); _ = np.asarray(idp[0, 0])
    agree = np.mean([
        len(set(np.asarray(idf)[b].tolist()) & set(np.asarray(idp)[b].tolist())) / K
        for b in range(B)
    ])
    for name, fn in (("flat", run_flat), ("pallas", run_pal),
                     ("flat", run_flat), ("pallas", run_pal)):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(8)]
        _ = np.asarray(outs[-1][0][0, 0])
        dt = (time.perf_counter() - t0) / 8
        print(f"B={B} {name}: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} QPS",
              flush=True)
    print(f"B={B} top-10 agreement: {agree:.4f}", flush=True)
