"""Pin the bench stdout artifact contract.

The driver tail-captures the LAST 2000 BYTES of stdout (measured from
BENCH_r03.json's "tail" field, whose head-cut JSON line is why round 3
has no machine-readable headline). bench.compact_line must therefore
emit a parseable JSON line that NEVER exceeds its cap, for any headline
size — including future rounds that grow the query list.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, STDOUT_LINE_CAP, compact_line


def _parse(line: str) -> dict:
    assert len(line) <= STDOUT_LINE_CAP < 2000
    d = json.loads(line)
    assert d["metric"] == "headline_suite_total"
    assert d["unit"] == "sec"
    assert isinstance(d["queries"], dict)
    return d


def test_current_headline_line_always_parses_under_cap():
    # the headline outgrew the fits-whole guarantee at 66 queries; the
    # contract is now: the line ALWAYS parses under the driver's
    # 2000-byte tail capture, "value" covers the full suite, and any
    # trimming drops only the FASTEST entries with the omitted mass
    # accounted (full precision always in bench_details.json + stderr)
    timings = {name: 9.999 for name in HEADLINE}
    timings[HEADLINE[0]] = 99.9  # a slowest entry that must survive
    total = round(sum(timings.values()), 3)
    line = compact_line(timings, total, 0.1)
    assert len(line) <= 1900
    d = _parse(line)
    assert d["value"] == total
    assert HEADLINE[0] in d["queries"]
    omitted_sec = d.get("queries_omitted_sec", 0.0)
    kept = sum(d["queries"].values())
    assert abs(kept + omitted_sec - total) < 1.0
    # as much of the suite as the byte budget allows stays visible on
    # stdout: ~30 bytes per entry means the 1900-byte cap tops out
    # around 60 entries — a 90-query headline physically cannot show
    # 3/4 of itself, so the floor is min(3/4, what fits). Everything
    # trimmed is still in bench_details.json at full precision.
    assert len(d["queries"]) >= min(len(HEADLINE) * 3 // 4, 55)


def test_oversized_headline_truncates_fastest_first_and_still_parses():
    timings = {f"some_very_long_query_name_number_{i:04d}": 0.01 * (i + 1)
               for i in range(200)}
    timings["slowest_query_of_all"] = 99.9
    total = round(sum(timings.values()), 3)
    d = _parse(compact_line(timings, total, 0.1))
    assert d["queries_omitted"] > 0
    # the slowest entry always survives; the omitted mass is accounted
    assert "slowest_query_of_all" in d["queries"]
    kept = sum(d["queries"].values())
    assert abs(kept + d["queries_omitted_sec"] - total) < 1.0
    assert d["value"] == total


def test_bench_details_sidecar_has_full_data_when_present():
    # bench_details.json is written by every bench run; when it exists it
    # must carry the fields the stdout line may omit
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_details.json",
    )
    if not os.path.exists(path):
        return
    d = json.load(open(path))
    assert "warm_samples" in d and "cold_queries" in d
