"""BASELINE config #4: facet-filtered search — fused mask cost vs unfiltered.

The reference pays searchK=Size() + per-candidate JSON unmarshal when filters
are present; here the mask fuses into the scan, so the ratio should be ~1.0.
"""

import numpy as np

from benches.common import emit, env_int, make_corpus, pipelined_ms


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.collection import Collection
    from quiver_tpu.types import Filter, SearchRequest

    N = env_int("QUIVER_BENCH_N", 100_000)
    D, B, K = 128, 256, 10
    vecs, rng = make_corpus(N, D)
    c = Collection("bench", D, "cosine", compute_dtype=jnp.bfloat16,
                   engine_factory=None)
    cats = rng.integers(0, 10, N)
    c.add_batch([f"v{i}" for i in range(N)], vecs,
                [{"cat": int(x), "price": float(p)}
                 for x, p in zip(cats, rng.random(N) * 100)])
    queries = rng.normal(size=(B, D)).astype(np.float32)

    reqs_plain = [SearchRequest(vector=q, top_k=K) for q in queries]
    reqs_eq = [SearchRequest(vector=q, top_k=K,
                             filters=[Filter("cat", "=", 3)]) for q in queries]
    reqs_range = [SearchRequest(vector=q, top_k=K,
                                filters=[Filter("price", ">", 25.0),
                                         Filter("price", "<", 75.0)])
                  for q in queries]
    plain_ms = pipelined_ms(lambda: c.search_batch(reqs_plain), depth=2)
    eq_ms = pipelined_ms(lambda: c.search_batch(reqs_eq), depth=2)
    range_ms = pipelined_ms(lambda: c.search_batch(reqs_range), depth=2)
    emit(f"filtered search QPS (equality), N={N}", B / (eq_ms / 1e3), "qps",
         overhead_vs_unfiltered=round(eq_ms / plain_ms, 3))
    emit(f"filtered search QPS (range x2), N={N}", B / (range_ms / 1e3), "qps",
         overhead_vs_unfiltered=round(range_ms / plain_ms, 3))


if __name__ == "__main__":
    main()
