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


def test_spark_normalized_per_segment_uses_bracketing_probes():
    """Each query divides by the MEAN of the probes bracketing its
    segment — contention in a later segment must move that segment's
    divisor, not the whole run's (the BENCH_r12 failure mode)."""
    timings = {"a": 1.0, "b": 2.0, "c": 3.0}
    segment_of = {"a": 0, "b": 0, "c": 1}
    probes = [1.0, 1.0, 3.0]  # segment 0 calm, segment 1 contended
    out = bench.spark_normalized_per_segment(timings, segment_of, probes)
    assert out == {"a": 1.0, "b": 2.0, "c": 1.5}  # c / ((1+3)/2)


def test_spark_normalized_per_segment_voids_on_bad_probes():
    """Missing, misaligned, or failed probes void the figure (never
    fabricate a normal): a query whose segment has no closing probe,
    a probe list shorter than 2, or a non-positive probe."""
    t, seg = {"a": 1.0}, {"a": 0}
    assert bench.spark_normalized_per_segment(t, seg, []) == {}
    assert bench.spark_normalized_per_segment(t, seg, [1.0]) == {}
    assert bench.spark_normalized_per_segment(t, seg, [1.0, 0.0]) == {}
    assert bench.spark_normalized_per_segment({"a": 1.0}, {"a": 5}, [1.0, 1.0]) == {}


def test_median_even_and_odd():
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0, 2.0, 3.0]) == 2.5


def test_bench_queries_are_registered():
    from visual_asset_management_system_spark.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, f"bench names not registered: {missing}"


def test_compact_line_bounded_under_driver_tail_capture():
    """The stdout record must fit the driver's 2000-char tail even for
    a far bigger registry than today's (BENCH_r09 recorded parsed=null
    when the full per-query line outgrew the capture)."""
    import json

    timings = {f"q_some_quite_long_query_name_{i:03d}": i + 0.123 for i in range(120)}
    detail = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "queries": timings,
        "sf": 0.1,
        "calib_sec": 1.234,
        "calib_mc_sec": 0.456,
        "value_normalized": 123.456,
    }
    errors = {f"_err_with_a_long_name_{i}": "x" * 500 for i in range(25)}
    line = json.dumps(bench.compact_line(detail, errors))
    assert len(line) < 1600, len(line)
    out = json.loads(line)
    assert out["n_queries"] == 120
    assert len(out["queries"]) == 5
    assert max(timings.values()) in out["queries"].values()
    assert out["detail_file"] == "BENCH_DETAIL.json"
    assert len(out["errors"]) == 10
    # error entries are names only, never 500-char messages
    assert all(len(e) < 60 for e in out["errors"])


def test_compact_line_totals_roundtrip_detail():
    """value / value_normalized on the line equal the detail's —
    the driver's record and the committed detail must agree."""
    detail = {
        "metric": "headline_queries_total_wall",
        "value": 10.5,
        "queries": {"a": 4.0, "b": 6.5},
        "sf": 0.01,
        "calib_sec": 1.0,
        "calib_mc_sec": 0.5,
        "calib_spark_sec": 2.0,
        "value_normalized": 21.0,
        "value_normalized_spark": 5.25,
    }
    out = bench.compact_line(detail, {})
    assert out["value"] == detail["value"]
    assert out["value_normalized"] == detail["value_normalized"]
    # both calibrations must reach the driver's parsed line (VERDICT
    # r10 next-round #6): the numpy loops track the HOST, the
    # engine-shaped micro-query tracks JVM/shuffle pressure
    assert out["calib_spark_sec"] == 2.0
    assert out["value_normalized_spark"] == 5.25
    assert "errors" not in out


def _load_soak():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "soak.py",
    )
    spec = importlib.util.spec_from_file_location("soak_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_soak_bestofn_agreement_rule():
    """The r12 soak sampling contract (bench.py's publication rule):
    two agreeing warm samples publish immediately; a stalled first
    sample forces more until two agree; a host that never settles
    caps at four samples and publishes the min."""
    soak = _load_soak()

    import time as _t

    class FakeTime:
        """Stand-in for soak's `time` module: each sample's duration is
        the next value of `durations` (time.time() is called exactly
        twice per sample — before and after fn)."""

        def __init__(self, durations):
            self.now = 0.0
            self.durs = list(durations)
            self.i = 0
            self.pending = None

        def time(self):
            if self.pending is None:
                self.pending = self.durs[self.i] if self.i < len(
                    self.durs
                ) else 0.0
                self.i += 1
                return self.now
            self.now += self.pending
            self.pending = None
            return self.now

    def run(durations, fn=lambda: None):
        soak.time = FakeTime(durations)
        try:
            return soak._bestofn(fn)
        finally:
            soak.time = _t

    calls = []
    assert run([1.0, 1.0], lambda: calls.append(1)) == 1.0
    assert len(calls) == 2  # agreement -> stop at 2

    # stall-suspect: 10.0 then 1.0 disagree (>25%), third at 1.1 agrees
    assert run([10.0, 1.0, 1.1]) == 1.0

    # never settles: 4 wildly different samples -> best of 4
    n = []
    assert run([10.0, 5.0, 2.5, 1.0], lambda: n.append(1)) == 1.0
    assert len(n) == 4


def test_soak_bestofn_stateful_restores_between_samples(tmp_path):
    """Stateful sampling must (a) hand every sample the PRISTINE store
    state — re-sampling a store update must never double-apply the
    mutation — and (b) leave the FINAL state post-fn, because the
    compaction section consumes the update section's stores. Dirs the
    fn CREATES are removed again before a re-run."""
    import os

    soak = _load_soak()
    d = str(tmp_path / "store")
    os.makedirs(d)
    with open(os.path.join(d, "state"), "w") as f:
        f.write("pristine")
    fresh = str(tmp_path / "created")
    seen = []

    def mutate():
        with open(os.path.join(d, "state")) as f:
            seen.append(f.read())
        with open(os.path.join(d, "state"), "w") as f:
            f.write("mutated")
        assert not os.path.isdir(fresh), "created dir must be reset"
        os.makedirs(fresh)
        with open(os.path.join(fresh, "x"), "w") as f:
            f.write("y")

    soak._bestofn_stateful([d, fresh], mutate, max_samples=2)
    # every sample saw the pristine input, never the mutated one
    assert seen == ["pristine", "pristine"]
    # final state is post-fn: mutation applied, created dir present
    with open(os.path.join(d, "state")) as f:
        assert f.read() == "mutated"
    assert os.path.isfile(os.path.join(fresh, "x"))
    # snapshots cleaned up
    assert not os.path.isdir(d + ".soaksnap")


def test_soak_bestofn_stateful_restores_on_exception(tmp_path):
    """A sample that raises mid-loop must not strand the harness:
    snapshots are removed, the store is restored to the PRISTINE
    pre-section state (downstream sections would otherwise consume a
    half-mutated store), created dirs are removed, and the exception
    still propagates."""
    import os

    import pytest

    soak = _load_soak()
    d = str(tmp_path / "store")
    os.makedirs(d)
    with open(os.path.join(d, "state"), "w") as f:
        f.write("pristine")
    fresh = str(tmp_path / "created")
    calls = []

    def mutate_then_fail():
        calls.append(1)
        with open(os.path.join(d, "state"), "w") as f:
            f.write("half-mutated")
        os.makedirs(fresh, exist_ok=True)
        if len(calls) == 2:
            raise RuntimeError("host fell over")

    with pytest.raises(RuntimeError, match="host fell over"):
        soak._bestofn_stateful([d, fresh], mutate_then_fail, max_samples=2)
    with open(os.path.join(d, "state")) as f:
        assert f.read() == "pristine"
    assert not os.path.isdir(fresh)
    assert not os.path.isdir(d + ".soaksnap")
