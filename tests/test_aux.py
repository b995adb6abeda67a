"""Arrow IPC, collector (CPU/mem/recall), profiling-span smoke tests."""

import numpy as np
import pytest

from quiver_tpu.core.collection import Collection
from quiver_tpu.observability.collector import Collector
from quiver_tpu.persistence.arrow_io import (
    export_collection,
    import_collection,
    load_arrow_ipc,
    save_arrow_ipc,
)

D = 8


def make_collection(n=50, name="arrow"):
    rng = np.random.default_rng(0)
    c = Collection(name, D, "euclidean")
    vecs = rng.normal(size=(n, D)).astype(np.float32)
    c.add_batch([f"v{i}" for i in range(n)], vecs,
                [{"i": i} for i in range(n)])
    return c, vecs


def test_arrow_ipc_roundtrip(tmp_path):
    p = str(tmp_path / "c.arrow")
    c, vecs = make_collection()
    export_collection(c, p)
    ids, rvecs, mds = load_arrow_ipc(p)
    assert ids == [f"v{i}" for i in range(50)]
    np.testing.assert_allclose(rvecs, vecs, rtol=1e-6)
    assert mds[3] == {"i": 3}
    # import into a fresh collection: replays through the write path
    c2 = Collection("fresh", D, "euclidean")
    assert import_collection(c2, p) == 50
    assert c2.size == 50
    from quiver_tpu.types import SearchRequest
    assert c2.search(SearchRequest(vector=vecs[7], top_k=1)).results[0].id == "v7"


def test_arrow_ipc_empty(tmp_path):
    p = str(tmp_path / "e.arrow")
    save_arrow_ipc(p, [], np.zeros((0, D), np.float32), [])
    ids, vecs, mds = load_arrow_ipc(p)
    assert ids == [] and len(vecs) == 0


def test_collector_snapshot_and_recall():
    c, vecs = make_collection(n=100, name="coll")
    col = Collector()
    col.record_latency(4.0)
    col.record_latency(8.0)
    snap = col.snapshot()
    assert snap.avg_latency_ms == pytest.approx(6.0)
    assert snap.memory_mb > 0
    r = col.measure_recall(c, k=5, sample=16)
    assert r == 1.0  # exact engine -> perfect recall
    assert col.snapshot().recall == 1.0


def test_collector_empty_collection_recall():
    c = Collection("empty2", D)
    assert Collector().measure_recall(c) == 0.0


def test_trace_span_smoke():
    from quiver_tpu.utils.profiling import annotate, trace_span

    with trace_span("unit", foo=1):
        pass

    @annotate()
    def f(x):
        return x + 1

    assert f(1) == 2


def test_bench_corpus_generators_agree():
    """The /tmp build/truth caches are only valid while every bench's
    corpus generator stays byte-identical (benches import or re-declare
    it); a silent divergence poisons warm-cache runs."""
    import numpy as np

    import bench
    from benches import bench_ivf, ivf_lab

    a = bench.clustered(512)
    assert np.array_equal(a, bench_ivf.clustered(512))
    assert np.array_equal(a, ivf_lab.clustered(512)[0])
