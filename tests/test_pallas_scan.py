"""Pallas fused-scan kernel tests (interpret mode on CPU; the same kernel
compiles natively on TPU — verified in bench/verify runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quiver_tpu.ops.distance import inv_norms, norms_sq
from quiver_tpu.ops.pallas_scan import pallas_scan_topk
from quiver_tpu.ops.scan import flat_scan_topk

D, K = 32, 5


def setup(n=8192, seed=0):
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    ns = norms_sq(v)
    return v, ns, inv_norms(ns), jnp.ones((n,), bool), rng


@pytest.mark.parametrize("metric", ["euclidean", "squared_euclidean", "cosine", "dot_product"])
def test_matches_oracle(metric):
    v, ns, inv, valid, rng = setup()
    q = jnp.asarray(rng.normal(size=(8, D)).astype(np.float32))
    d_ref, i_ref = flat_scan_topk(q, v, valid, None, ns, inv,
                                  metric=metric, k=K, tile=8192)
    d_pal, i_pal = pallas_scan_topk(q, v, valid, None, ns, inv,
                                    metric=metric, k=K, tile=2048,
                                    compute_dtype=jnp.float32, interpret=True)
    i_r, i_p = np.asarray(i_ref), np.asarray(i_pal)
    recall = np.mean([
        len(set(i_r[b].tolist()) & set(i_p[b].tolist())) / K for b in range(8)
    ])
    # segment-collision loss bound: ~1 - (k-1)*128/(2N) ~ 0.96 at N=8192;
    # at serving scale (N >= 256k) this is > 0.999
    assert recall >= 0.9, f"{metric}: recall {recall}"
    agree = i_r == i_p
    np.testing.assert_allclose(
        np.asarray(d_ref)[agree], np.asarray(d_pal)[agree], rtol=1e-3, atol=1e-3
    )


def test_mask_fused():
    v, ns, inv, valid, rng = setup()
    mask_np = rng.random(8192) < 0.02
    q = jnp.asarray(rng.normal(size=(4, D)).astype(np.float32))
    _, idx = pallas_scan_topk(q, v, valid, jnp.asarray(mask_np), ns, inv,
                              metric="euclidean", k=K, tile=256,
                              compute_dtype=jnp.float32, interpret=True)
    idx = np.asarray(idx)
    assert ((idx < 0) | mask_np[np.maximum(idx, 0)]).all()


def test_invalid_rows_excluded():
    v, ns, inv, valid, rng = setup()
    valid = valid.at[:4096].set(False)
    q = jnp.asarray(rng.normal(size=(2, D)).astype(np.float32))
    _, idx = pallas_scan_topk(q, v, valid, None, ns, inv,
                              metric="euclidean", k=K, tile=256,
                              compute_dtype=jnp.float32, interpret=True)
    assert (np.asarray(idx) >= 4096).all()


def test_unaligned_batch_padded():
    v, ns, inv, valid, rng = setup()
    q = jnp.asarray(rng.normal(size=(3, D)).astype(np.float32))  # not 8-mult
    d, idx = pallas_scan_topk(q, v, valid, None, ns, inv,
                              metric="euclidean", k=K, tile=256,
                              compute_dtype=jnp.float32, interpret=True)
    assert d.shape == (3, K) and idx.shape == (3, K)


def test_manhattan_rejected():
    v, ns, inv, valid, rng = setup()
    q = jnp.asarray(rng.normal(size=(2, D)).astype(np.float32))
    with pytest.raises(ValueError, match="manhattan"):
        pallas_scan_topk(q, v, valid, None, ns, inv,
                         metric="manhattan", k=K, interpret=True)


def test_auto_tile_shrinks_for_big_batch():
    # must not raise even when B * tile would blow the score budget
    v, ns, inv, valid, rng = setup(n=512)
    q = jnp.asarray(rng.normal(size=(64, D)).astype(np.float32))
    d, idx = pallas_scan_topk(q, v, valid, None, ns, inv,
                              metric="euclidean", k=K, tile=512,
                              compute_dtype=jnp.float32, interpret=True)
    assert idx.shape == (64, K)
