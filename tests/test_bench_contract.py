"""bench.py driver-contract line: must survive the 2000-byte tail capture.

The driver records only the tail of bench.py's stdout and json-parses the
LAST line. Rounds 5 and 9 both shipped `parsed: null` because a per-query
dict rode on that line and outgrew the tail as query count grew. These
tests pin the fix: the contract line is O(1)-sized in query count and
parses out of a simulated truncated tail no matter how many queries run.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CONTRACT_LINE_MAX_BYTES, build_contract_line

DRIVER_TAIL_BYTES = 2000


def _simulated_stdout(n_queries: int) -> str:
    """Reproduce bench.py's stdout shape for n_queries queries."""
    timings = {f"query_with_a_long_descriptive_name_{i:04d}": 1.234 for i in range(n_queries)}
    spread = {
        name: {"min": 1.2, "med": 1.3, "max": 9.9, "n": 3} for name in timings
    }
    sf_dir = "/root/testdata/sf0.1"
    lines = [
        json.dumps({"spread": spread}),
        json.dumps({"queries": timings, "sf": sf_dir}),
        build_contract_line(round(sum(timings.values()), 3), len(timings), sf_dir),
    ]
    return "\n".join(lines) + "\n"


def _driver_parse(stdout: str) -> dict | None:
    """The driver's parse: keep the tail, json-load the last non-empty line."""
    tail = stdout[-DRIVER_TAIL_BYTES:]
    for line in reversed(tail.strip().splitlines()):
        line = line.strip()
        if not line:
            continue
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            return None
    return None


@pytest.mark.parametrize("n_queries", [1, 71, 200, 1000])
def test_contract_line_survives_tail_truncation(n_queries):
    parsed = _driver_parse(_simulated_stdout(n_queries))
    assert parsed is not None
    assert parsed["metric"] == "total_query_seconds"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == n_queries
    assert isinstance(parsed["value"], float)
    assert "queries" not in parsed  # per-query payload must never ride here


def test_contract_line_is_small_and_fixed_size():
    a = build_contract_line(42.0, 1, "/root/testdata/sf0.1")
    b = build_contract_line(4242.123, 100000, "/root/testdata/sf0.1")
    assert len(a.encode()) <= CONTRACT_LINE_MAX_BYTES
    assert len(b.encode()) <= CONTRACT_LINE_MAX_BYTES
    # size is O(1) in query count: growing n_queries 5 orders of magnitude
    # moves the line by the digit width only
    assert abs(len(b) - len(a)) < 20


def test_contract_line_rejects_oversize():
    with pytest.raises(ValueError):
        build_contract_line(1.0, 1, "x" * (CONTRACT_LINE_MAX_BYTES + 1))
