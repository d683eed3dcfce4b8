"""Driver-contract pins for bench.py's stdout protocol.

Round-2 lesson: the full bench JSON line outgrew the driver's bounded
tail capture and BENCH_r02 came back parsed:null, losing the official
record of the scaling gate.  bench.py now prints a compact digest as the
FINAL line; these tests pin that the digest (a) stays small enough for
any plausible tail buffer, (b) round-trips through json, and (c) carries
the fields the judge reads (value + both scaling efficiencies + the
pure-CPU ceiling they are calibrated against).
"""

from __future__ import annotations

import json

import bench


def _full_payload(n_queries: int = 200) -> dict:
    return {
        "metric": "headline_queries_total_sec",
        "unit": "sec",
        "sf": "/root/testdata/sf0.1",
        "queries": {f"a_rather_long_query_name_{i:03d}": round(0.2 + i * 0.317, 3)
                    for i in range(n_queries)},
        "query_runs": {f"a_rather_long_query_name_{i:03d}": [9.9, 5.5]
                       for i in range(n_queries)},
        "rows": {f"a_rather_long_query_name_{i:03d}": 123456789
                 for i in range(n_queries)},
        "scaling": {
            "efficiency_2_to_8": 0.8364,
            "efficiency_8_to_32": 0.52,
            "efficiency_8_to_32_vs_cpu_ceiling": 0.91,
            "cpu_calibration": {"cpu_eff_2_to_8": 0.997,
                                "cpu_eff_8_to_32": 0.57},
        },
        "pagerank_bench": {"median_iter_sec": 0.554,
                           "edges_per_sec": 2334000.0},
        "value": 104.453,
    }


def test_compact_summary_bounded_and_parseable():
    # even with 200 long-named queries the digest keeps only the top 10
    line = json.dumps(bench.compact_summary(_full_payload(200)))
    assert len(line) < 1000
    parsed = json.loads(line)
    assert parsed["value"] == 104.453
    assert parsed["unit"] == "sec"
    assert parsed["efficiency_2_to_8"] == 0.8364
    assert parsed["efficiency_8_to_32"] == 0.52
    assert parsed["cpu_eff_2_to_8"] == 0.997
    assert parsed["cpu_eff_8_to_32"] == 0.57
    assert parsed["efficiency_8_to_32_vs_cpu_ceiling"] == 0.91
    assert parsed["pagerank_median_iter_sec"] == 0.554
    assert parsed["n_queries"] == 200
    assert len(parsed["queries"]) == 10
    # top-10 selection is by descending time
    assert min(parsed["queries"].values()) >= 0.2 + 189 * 0.317


def test_compact_summary_without_scaling():
    # SPARK_GRAFT_SKIP_SCALING=1 runs omit the scaling block entirely
    payload = _full_payload(5)
    del payload["scaling"]
    del payload["pagerank_bench"]
    parsed = json.loads(json.dumps(bench.compact_summary(payload)))
    assert parsed["value"] == 104.453
    assert "efficiency_2_to_8" not in parsed
    assert len(parsed["queries"]) == 5
