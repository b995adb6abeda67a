"""Metrics registry + structured-logging tests (reference:
pkg/core/metrics.go names/taxonomy, pkg/core/logging.go JSON logs)."""

import json
import logging as std_logging

import pytest

from quiver_tpu.observability.logging import JSONFormatter, Tracer, get_logger
from quiver_tpu.observability.metrics import Metrics, _LatencyRing


def test_latency_ring_percentiles():
    r = _LatencyRing(size=100)
    for i in range(1, 101):
        r.record(float(i))
    s = r.stats()
    assert s["count"] == 100
    assert s["avg_ms"] == pytest.approx(50.5)
    assert s["p50_ms"] == pytest.approx(50, abs=2)
    assert s["p95_ms"] == pytest.approx(95, abs=2)
    assert s["p99_ms"] == pytest.approx(99, abs=2)


def test_latency_ring_wraps():
    r = _LatencyRing(size=10)
    for i in range(25):
        r.record(1000.0 if i < 15 else 1.0)
    s = r.stats()
    assert s["count"] == 10  # only the window
    assert s["avg_ms"] == pytest.approx(1.0)  # old samples evicted


def test_metrics_search_and_qps():
    m = Metrics()
    m.enable()  # metrics are opt-in; the DB enables them at startup
    for _ in range(5):
        m.record_search("docs", 2.0, stages={"traversal": 1.5})
    st = m.latency_stats("docs")
    assert st["count"] == 5 and st["avg_ms"] == pytest.approx(2.0)
    assert m.current_qps(window_s=60.0) > 0
    summary = m.summary()
    assert "docs" in json.dumps(summary)


def test_metrics_prometheus_exposition():
    m = Metrics()
    m.enable()
    m.record_search("docs", 1.0)
    m.record_insert("docs", 0.5, n=4)
    m.record_error("docs", "search")
    m.set_index_size("docs", 42, nbytes=1024)
    text = m.prometheus_text().decode()
    # reference metric names survive (SURVEY.md §5.5)
    for needle in ("quiver_search_duration_ms", "quiver_index_size"):
        assert needle in text
    # exposition format: HELP/TYPE pairs and sample lines parse
    lines = [l for l in text.splitlines() if l and not l.startswith("#")]
    for line in lines:
        name_part, _, value = line.rpartition(" ")
        assert name_part, line
        float(value)  # must parse


def test_metrics_disable_gate():
    m = Metrics()
    m.enable(False)
    m.record_search("docs", 1.0)
    assert m.latency_stats("docs")["count"] == 0
    m.enable(True)
    m.record_search("docs", 1.0)
    assert m.latency_stats("docs")["count"] == 1


def test_json_log_format():
    rec = std_logging.LogRecord(
        "quiver", std_logging.INFO, __file__, 1, "hello", None, None
    )
    rec.fields = {"collection": "docs", "n": 3}
    out = json.loads(JSONFormatter().format(rec))
    assert out["msg"] == "hello"
    assert out["level"].lower() == "info"
    assert out["collection"] == "docs" and out["n"] == 3
    assert "time" in out and "source" in out


def test_tracer_spans_nest_and_time():
    t = Tracer(enabled=True)
    with t.span("outer", a=1) as s:
        s.set(b=2)
        with t.span("inner"):
            pass
    # span end returns duration; a fresh span reports >= 0 ms
    sp = t.start_span("solo")
    assert sp.end() >= 0.0


def test_get_logger_idempotent_handlers():
    l1 = get_logger()
    l2 = get_logger()
    assert l1 is l2
    assert len(l1.handlers) == len(l2.handlers)
