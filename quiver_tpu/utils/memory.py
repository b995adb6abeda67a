"""Device-memory accounting (VERDICT r3 next #3).

The BASELINE target reads "≥10x ... at equal memory"; this module makes
the memory side checkable: `device_bytes(obj)` walks an object's
attributes and sums the nbytes of every live jax.Array buffer it owns —
engines report it through get_detailed_metrics()["device_bytes"], and the
bench matrix derives bytes/vector per engine from it. memory_stats() is
unavailable over the axon tunnel, so accounting is from the buffers
themselves (every device allocation the engines make IS one of these
arrays; XLA scratch inside a program is transient and bounded by the
program's working set).

Reference contrast: per-op B/op columns in
/root/reference/final_bench.txt:18-19 (Go testing.B allocations).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

#: walk depth bound — engines nest at most (engine -> layers[list] ->
#: _Layer -> arrays); anything deeper is a cycle or foreign object
_MAX_DEPTH = 5


def _is_device_array(x: Any) -> bool:
    return isinstance(x, jax.Array)


def _buffer_key(x: jax.Array):
    """Identity of the UNDERLYING device buffer(s), not the Python object:
    two jax.Array views aliasing one buffer must count once (ADVICE r4
    #4 — id() dedup double-counted aliases)."""
    try:
        return ("p", x.unsafe_buffer_pointer())
    except Exception:  # noqa: BLE001 — sharded arrays have no single ptr
        try:
            return ("s", tuple(
                s.data.unsafe_buffer_pointer() for s in x.addressable_shards
            ))
        except Exception:  # noqa: BLE001
            return ("i", id(x))


def _per_chip_nbytes(x: jax.Array) -> int:
    """Bytes this array occupies PER CHIP: for a mesh-sharded array,
    jax.Array.nbytes is the GLOBAL logical size — reporting it as a
    per-chip footprint overstates HBM by the shard count (ADVICE r4 #4).
    Sums the addressable shards' real buffer bytes and divides by the
    number of distinct devices they live on (replicated arrays cost their
    full size on every chip and report it; evenly sharded arrays report
    global/n)."""
    try:
        shards = x.addressable_shards
        if not shards:
            return int(x.nbytes)
        n_dev = len({s.device for s in shards})
        return int(sum(s.data.nbytes for s in shards) / max(n_dev, 1))
    except Exception:  # noqa: BLE001
        return int(x.nbytes)


def device_bytes(obj: Any, *, skip: tuple = ()) -> int:
    """Per-chip bytes of device buffers reachable from ``obj``'s attributes.

    Follows quiver_tpu-defined objects, lists/tuples/dicts; stops at any
    object whose type is in ``skip`` (e.g. VectorStore, so an engine's own
    footprint excludes the store it shares with every other engine).
    Duplicate buffers (aliases) count once, by underlying buffer identity;
    mesh-sharded arrays count their per-chip share (see _per_chip_nbytes).
    """
    seen_objs: set[int] = set()
    seen_bufs: set = set()
    total = 0

    def walk(x, depth):
        nonlocal total
        if x is None or depth > _MAX_DEPTH:
            return
        if _is_device_array(x):
            key = _buffer_key(x)
            if key not in seen_bufs:
                seen_bufs.add(key)
                total += _per_chip_nbytes(x)
            return
        if isinstance(x, (str, bytes, int, float, bool, np.ndarray)):
            return
        if isinstance(x, dict):
            for v in x.values():
                walk(v, depth + 1)
            return
        if isinstance(x, (list, tuple, set)):
            for v in x:
                walk(v, depth + 1)
            return
        mod = type(x).__module__ or ""
        if not mod.startswith("quiver_tpu"):
            return
        if isinstance(x, skip) or id(x) in seen_objs:
            return
        seen_objs.add(id(x))
        for v in vars(x).values():
            walk(v, depth + 1)

    walk(obj, 0)
    return total


def store_device_bytes(store) -> int:
    """Device bytes of a VectorStore's synced view (vectors + valid +
    norms), 0 if the view was never materialized."""
    view = store._device
    if view is None:
        return 0
    return int(
        view.vectors.nbytes + view.valid.nbytes
        + view.norms_sq.nbytes + view.inv_norms.nbytes
    )
