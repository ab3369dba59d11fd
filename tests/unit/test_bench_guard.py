"""Bench regression guard (VERDICT r3 #6): a deliberate slowdown trips it."""

import importlib.util
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[2]

spec = importlib.util.spec_from_file_location("root_bench", REPO / "bench.py")
root_bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(root_bench)


REF = {"value": 574.75, "train_value": 52.0, "train512_value": 2.41,
       "serve512_value": 92.0}


def test_deliberate_slowdown_trips():
    out = dict(REF, value=520.0)            # 9.5% drop on the headline
    msgs = root_bench.check_regression(out, REF)
    assert len(msgs) == 1 and "REGRESSION value" in msgs[0]


def test_all_metrics_guarded():
    out = {k: v * 0.9 for k, v in REF.items()}
    msgs = root_bench.check_regression(out, REF)
    assert len(msgs) == len(root_bench.GUARDED_KEYS)


def test_within_threshold_passes():
    out = {k: v * 0.98 for k, v in REF.items()}   # 2% < 3% threshold
    assert root_bench.check_regression(out, REF) == []
    assert root_bench.check_regression(dict(REF), REF) == []


def test_improvement_passes():
    out = {k: v * 1.2 for k, v in REF.items()}
    assert root_bench.check_regression(out, REF) == []


def test_missing_keys_are_skipped():
    # older BENCH artifacts may lack newer metrics (and vice versa)
    assert root_bench.check_regression({"value": 500.0}, {}) == []
    assert root_bench.check_regression({}, REF) == []
    assert root_bench.check_regression(
        {"value": 574.0, "train512_error": "boom"}, REF) == []


def test_latest_committed_bench_reads_newest_round():
    got = root_bench.latest_committed_bench()
    assert got is not None
    name, ref = got
    rounds = sorted(int(p.name[7:-5]) for p in REPO.glob("BENCH_r*.json"))
    assert name == f"BENCH_r{rounds[-1]:02d}.json"
    assert isinstance(ref.get("value"), float)
    # the committed artifact wraps metrics under "parsed" — confirm unwrap
    with open(REPO / name) as f:
        assert ref == json.load(f)["parsed"]
