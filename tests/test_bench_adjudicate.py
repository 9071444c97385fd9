"""bench.py self-adjudication (round 11): flagging, verdicts, and the
configuration guard.

Pure-python: the dedicated-recheck subprocess is monkeypatched, no
SparkSession is created. The guard matters because the round driver also
runs the bench at a LOWER core count to measure scaling — 32-core records
compared against an 8-core run would flag half the registry and stamp
bogus 'confirmed' verdicts on environmental slowdowns.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_baseline(tmp_path, entries, cpus=32, sf_dir="sf0.1"):
    path = tmp_path / "baseline.json"
    path.write_text(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "entries": entries}))
    return str(path)


@pytest.fixture
def env(monkeypatch, tmp_path, bench):
    def setup(entries, *, run_cpus=32, base_cpus=32, base_sf="sf0.1"):
        monkeypatch.setenv(
            "SPARK_GRAFT_BENCH_BASELINE",
            _write_baseline(tmp_path, entries, cpus=base_cpus, sf_dir=base_sf),
        )
        monkeypatch.setenv("SPARK_GRAFT_CPUS", str(run_cpus))
        monkeypatch.setenv("SPARK_GRAFT_ADJUDICATE", "1")
        # pin the run sf regardless of what SPARK_GRAFT_SF_DIR was at import
        monkeypatch.setattr(bench, "_ORIG_SF_DIR", "/root/testdata/sf0.1")

    return setup


def test_quiet_run_flags_nothing(bench, env):
    env({"a": 1.0, "b": 2.0})
    assert bench._adjudicate({"a": 1.2, "b": 2.9}, "/tmp") == {}


def test_breach_is_rechecked_and_verdicts_stamped(bench, env, monkeypatch):
    env({"spiky": 1.0, "slow": 1.0})
    rechecks = {
        # dedicated best back inside 1.25x the record -> environmental
        "spiky": {"runs": [1.1, 1.2, 1.3], "median": 1.2},
        # dedicated best still above 1.5x the record -> confirmed
        "slow": {"runs": [1.9, 2.0, 2.1], "median": 2.0},
    }
    monkeypatch.setattr(
        bench, "_dedicated_recheck", lambda name, _dir: rechecks[name]
    )
    out = bench._adjudicate({"spiky": 3.0, "slow": 2.2}, "/tmp")
    assert out["spiky"]["verdict"] == "environmental"
    assert out["spiky"]["ratio"] == 3.0
    assert out["slow"]["verdict"] == "confirmed"


def test_inconclusive_between_bands(bench, env, monkeypatch):
    env({"mid": 1.0})
    monkeypatch.setattr(
        bench,
        "_dedicated_recheck",
        lambda *_: {"runs": [1.4, 1.45, 1.5], "median": 1.45},
    )
    out = bench._adjudicate({"mid": 1.6}, "/tmp")
    assert out["mid"]["verdict"] == "inconclusive"


def test_lower_core_scaling_run_skips_adjudication(bench, env):
    env({"a": 1.0}, run_cpus=8, base_cpus=32)
    out = bench._adjudicate({"a": 5.0}, "/tmp")
    assert list(out) == ["_skipped"] and "cpus" in out["_skipped"]


def test_off_sf_run_skips_adjudication(bench, env, monkeypatch):
    env({"a": 1.0}, base_sf="sf0.001")
    out = bench._adjudicate({"a": 5.0}, "/tmp")
    assert list(out) == ["_skipped"] and "sf" in out["_skipped"]


def test_missing_baseline_is_silent(bench, monkeypatch, tmp_path):
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_BASELINE", str(tmp_path / "nope.json")
    )
    assert bench._adjudicate({"a": 99.0}, "/tmp") == {}


def test_recheck_cap_marks_skipped(bench, env, monkeypatch):
    entries = {f"e{i}": 1.0 for i in range(8)}
    env(entries)
    monkeypatch.setattr(bench, "_ADJUDICATE_MAX", 2)
    monkeypatch.setattr(
        bench, "_dedicated_recheck", lambda *_: {"runs": [1.0], "median": 1.0}
    )
    out = bench._adjudicate({k: 4.0 for k in entries}, "/tmp")
    assert sum(1 for v in out.values() if v["verdict"] == "skipped_cap") == 6
    assert sum(1 for v in out.values() if v["verdict"] == "environmental") == 2
