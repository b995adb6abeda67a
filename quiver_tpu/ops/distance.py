"""Batched distance kernels.

TPU-native replacement for the reference's scalar per-pair distance loops
(reference: pkg/vectortypes/distances.go:12-104, plus the duplicate kernels in
pkg/hnsw/adapter.go:105-167 and pkg/arrowindex/graph.go:749-858). One batched
formulation serves every engine: distances are computed for a whole query block
against a whole vector tile at once, with the dot-product family riding the MXU
via a single matmul and the Manhattan metric on the VPU.

Semantics match the reference exactly:
  cosine    = 1 - cos_sim, zero-vector guard -> 1, sim clamped to [-1, 1]
  euclidean = sqrt(sum (a-b)^2)
  squared_euclidean
  dot_product = 1 - <a, b>
  manhattan = sum |a - b|
All "smaller is better"; score = 1 - distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quiver_tpu.types import DistanceType

# Metrics whose pairwise form reduces to a matmul on the MXU.
_MATMUL_METRICS = (
    DistanceType.COSINE,
    DistanceType.EUCLIDEAN,
    DistanceType.SQUARED_EUCLIDEAN,
    DistanceType.DOT_PRODUCT,
)


@jax.jit
def _norms_sq_fused(v: jax.Array) -> jax.Array:
    v = v.astype(jnp.float32)
    return jnp.sum(v * v, axis=-1)


def norms_sq(v: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, f32.

    Jitted so the square fuses into the reduce: called eagerly on a large
    corpus (store.device_view at 10M rows), the unfused ``v * v`` alone
    materializes a corpus-sized temporary and OOMs HBM.
    """
    return _norms_sq_fused(v)


def inv_norms(v_norms_sq: jax.Array) -> jax.Array:
    """Row-wise 1/||v||, with 0 for zero vectors (cosine zero-guard)."""
    n = jnp.sqrt(v_norms_sq)
    return jnp.where(n > 0, 1.0 / jnp.maximum(n, 1e-30), 0.0)


def pairwise_distance(
    q: jax.Array,
    v: jax.Array,
    metric: DistanceType,
    *,
    v_norms_sq: jax.Array | None = None,
    v_inv_norms: jax.Array | None = None,
    compute_dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """Distances between every query row and every vector row.

    Args:
      q: f32[B, d] queries.
      v: [N, d] vectors (any float dtype).
      metric: static DistanceType.
      v_norms_sq / v_inv_norms: optional precomputed f32[N] row stats
        (amortized across queries by the column store).
      compute_dtype: matmul input dtype — jnp.float32 for exactness,
        jnp.bfloat16 for the fast path (accumulation is always f32).
      precision: matmul precision. None (DEFAULT) lets the TPU MXU run f32
        inputs as ONE bf16 pass — fine for ranking in the approximate
        engines, but it silently degrades the "exact" contract to bf16
        ranking noise (measured: exact recall@10 0.926 on the heavy-tail
        corpus family, benches/bench_corpus_matrix.py 2026-08-20).
        "highest" forces true-f32 multiplies for the oracle/exact paths.

    Returns:
      f32[B, N] distances (smaller is better).
    """
    metric = DistanceType.parse(metric)
    q = q.astype(jnp.float32)

    if metric == DistanceType.MANHATTAN:
        # VPU path: |q - v| summed over d. XLA fuses broadcast+abs+reduce
        # into one loop, so the [B, N, d] intermediate never materializes.
        diff = q[:, None, :] - v[None, :, :].astype(jnp.float32)
        return jnp.sum(jnp.abs(diff), axis=-1)

    if v_norms_sq is None:
        v_norms_sq = norms_sq(v)
    dots = jnp.dot(
        q.astype(compute_dtype),
        v.astype(compute_dtype).T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [B, N] on the MXU

    if metric == DistanceType.DOT_PRODUCT:
        return 1.0 - dots  # reference: distances.go:77-90
    if metric == DistanceType.COSINE:
        if v_inv_norms is None:
            v_inv_norms = inv_norms(v_norms_sq)
        q_inv = inv_norms(norms_sq(q))
        sim = dots * q_inv[:, None] * v_inv_norms[None, :]
        sim = jnp.clip(sim, -1.0, 1.0)
        # Zero-vector guard: a zero q or v row yields sim == 0 -> distance 1,
        # matching reference distances.go:12-40.
        return 1.0 - sim
    # Euclidean family: ||q||^2 + ||v||^2 - 2 q.v, clamped >= 0.
    d2 = norms_sq(q)[:, None] + v_norms_sq[None, :] - 2.0 * dots
    d2 = jnp.maximum(d2, 0.0)
    if metric == DistanceType.SQUARED_EUCLIDEAN:
        return d2
    return jnp.sqrt(d2)


def distance_pairs(a: jax.Array, b: jax.Array, metric: DistanceType) -> jax.Array:
    """Elementwise-paired distances d(a[i], b[i]) -> f32[B].

    Used by the negative-example rerank pass and by tests as a per-pair oracle.
    """
    metric = DistanceType.parse(metric)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if metric == DistanceType.MANHATTAN:
        return jnp.sum(jnp.abs(a - b), axis=-1)
    if metric in (DistanceType.DOT_PRODUCT, DistanceType.COSINE):
        dots = jnp.sum(a * b, axis=-1)
        if metric == DistanceType.DOT_PRODUCT:
            return 1.0 - dots
        ia = inv_norms(norms_sq(a))
        ib = inv_norms(norms_sq(b))
        sim = jnp.clip(dots * ia * ib, -1.0, 1.0)
        return 1.0 - sim
    # euclidean family: direct (a-b)^2 form — the affine ||a||^2+||b||^2-2ab
    # cancels catastrophically for near pairs (error ~ eps*||a||^2 vs the
    # direct form's eps*d^2), and this pass is the winners' TRUE distance
    diff = a - b
    d2 = jnp.sum(diff * diff, axis=-1)
    if metric == DistanceType.SQUARED_EUCLIDEAN:
        return d2
    return jnp.sqrt(d2)
