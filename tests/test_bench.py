"""Unit coverage for bench.py's pure pieces (the artifact itself runs
out-of-band; never execute main() under pytest — timing under suite
load is exactly the host noise the normalization exists to remove)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench


def test_normalized_divides_by_mc_calibration():
    t = {"q1": 3.0, "q2": 1.5}
    assert bench.normalized(t, 2.0) == {"q1": 1.5, "q2": 0.75}


def test_normalized_rounds_to_millis():
    assert bench.normalized({"q": 1.0}, 3.0) == {"q": 0.333}


def test_normalized_empty_on_failed_calibration():
    assert bench.normalized({"q": 1.0}, 0.0) == {}
    assert bench.normalized({"q": 1.0}, -1.0) == {}


def test_bench_queries_are_registered():
    from visual_asset_management_system_spark.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, f"bench names not registered: {missing}"
