"""Observability tests: rate meters and trace annotation context."""

import time

from qoc_tpu.profiler import RateMeter, trace_annotation


def test_rate_meter_counts_and_rates():
    meter = RateMeter().start()
    for _ in range(5):
        time.sleep(0.002)
        meter.tick()
    assert meter.count == 5
    assert meter.rate > 0
    assert meter.mean_rate > 0
    assert meter.mean_rate < 5000


def test_rate_meter_bulk_ticks():
    meter = RateMeter().start()
    time.sleep(0.002)
    meter.tick(n=100)
    assert meter.count == 100
    assert meter.mean_rate > 1000


def test_trace_annotation_context():
    with trace_annotation("qoc_tpu_test_span"):
        x = sum(range(10))
    assert x == 45
