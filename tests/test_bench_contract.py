"""Driver-facing bench output contract.

The driver captures only the TAIL (~2000 chars) of bench.py stdout and
parses the final line as JSON.  A line carrying the per-query map
overflowed that capture twice (VERDICT r3 #4 with 66 queries, r5 #1
with 78) — the head truncates away and the driver records
"parsed": null.  This pins the line compact forever: per-query detail
belongs in bench_detail.json, never stdout.
"""

from __future__ import annotations

import json

import bench


def test_summary_line_is_compact_and_parseable():
    line = bench.summary_line(12345.678, 0.1, len(bench.BENCH_QUERIES), 1.234)
    assert len(line) < 1500, (
        "bench stdout line must stay far below the driver's ~2000-char "
        "tail capture; keep per-query maps in bench_detail.json"
    )
    parsed = json.loads(line)
    assert parsed == {
        "metric": "headline_queries_total",
        "value": 12345.678,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(bench.BENCH_QUERIES),
        "calib_ratio": 1.234,
    }


def test_host_calibration_is_deterministic_work():
    """The calibration must measure the host, not itself vary: two
    back-to-back readings agree within the scheduler-noise band (50%
    — generous, since a mid-test slow-mode flip is possible; the real
    pin is that the function returns quickly and positively)."""
    a = bench.host_calibration_sec()
    b = bench.host_calibration_sec()
    assert a > 0 and b > 0
    assert max(a, b) / min(a, b) < 1.5, (a, b)


def test_summary_line_size_is_independent_of_query_count():
    # even a pathological future count keeps the line ~120 chars
    assert len(bench.summary_line(9999999.999, 0.1, 10_000)) < 200
