"""Host<->device transfer helpers.

The serving wrappers return numpy to callers (the collection/API layer is
host-side, reference pkg/core/collection.go:637-807), and over a remote
dispatch link every synchronous ``np.asarray(device_array)`` pays one full
round trip. Fetching results one-by-one therefore multiplies the link RTT
by the number of output arrays — measured at ~30 ms per extra fetch through
the axon tunnel, which dominated the engine wrappers' wall time. These
helpers start all copies asynchronously first, so N arrays cost ~one RTT.
"""

from __future__ import annotations

import numpy as np


def fetch_np(*arrays) -> tuple[np.ndarray, ...]:
    """Device->host fetch with overlapped async copies.

    Every argument's copy is started before any is awaited, so the total
    wall time is one link round trip plus the largest transfer, not the
    sum. Non-device values (numpy arrays, lists) pass through np.asarray
    unchanged. Returns writable numpy copies when the source is a device
    array (jax buffers arrive read-only; the merge paths edit rows).
    """
    for a in arrays:
        start = getattr(a, "copy_to_host_async", None)
        if start is not None:
            try:
                start()
            except Exception:
                pass  # committed-elsewhere or deleted buffers: np path below
    out = []
    for a in arrays:
        host = np.asarray(a)
        if not host.flags.writeable:
            host = host.copy()
        out.append(host)
    return tuple(out)
