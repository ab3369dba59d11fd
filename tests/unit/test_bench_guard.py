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


def test_latest_committed_bench_reads_newest_good_round():
    got = root_bench.latest_committed_bench()
    assert got is not None
    name, ref = got
    # the newest round whose artifact actually parsed to metrics: BENCH_r04
    # is a timed-out {"parsed": null} artifact and must be skipped
    # (VERDICT r4 #2), not returned as an empty dict.
    good = []
    for p in REPO.glob("BENCH_r*.json"):
        with open(p) as f:
            parsed = json.load(f).get("parsed")
        if isinstance(parsed, dict) and isinstance(
                parsed.get("value"), (int, float)):
            good.append(int(p.name[7:-5]))
    assert name == f"BENCH_r{max(good):02d}.json"
    assert isinstance(ref.get("value"), float)
    # the committed artifact wraps metrics under "parsed" — confirm unwrap
    with open(REPO / name) as f:
        assert ref == json.load(f)["parsed"]


def test_null_artifact_falls_back_to_newest_good(tmp_path, monkeypatch):
    # r04-shaped failure artifact (rc 124, parsed null) + a good r03:
    # the guard must fall back to r03 rather than compare against nothing.
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"n": 3, "rc": 0, "parsed": dict(REF)}))
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(
        {"n": 4, "rc": 124, "tail": "WARNING: ...", "parsed": None}))
    monkeypatch.setattr(root_bench, "ROOT", str(tmp_path))
    name, ref = root_bench.latest_committed_bench()
    assert name == "BENCH_r03.json"
    assert ref == REF


def test_all_null_artifacts_yield_none(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": {}}))
    monkeypatch.setattr(root_bench, "ROOT", str(tmp_path))
    assert root_bench.latest_committed_bench() is None
