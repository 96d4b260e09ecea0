"""BENCH.md is GENERATED (bench._write_bench_md) from the saved
evidence files — SCALING_local.json, SCALING_localcluster.json,
MEMBW_probe.json.  These tests pin two things:

1. the section renderers emit every evidence table they have data
   for (a sweep re-run must never silently drop the probe section or
   the other mode's table);
2. the committed BENCH.md matches a fresh render of the committed
   JSONs byte-for-byte, so hand-edits that the next ``--scaling`` run
   would wipe can't land unnoticed.

No Spark needed — pure file rendering.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_for_md_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_section_renders_retention_table():
    bench = _bench()
    if not os.path.isfile(os.path.join(REPO, "MEMBW_probe.json")):
        pytest.skip("probe not run in this tree")
    sec = bench._probe_section()
    assert "Memory-bandwidth probe" in sec
    assert "retention vs 1 proc" in sec
    # the full-load row carries the min-proc spread annotation
    assert "min proc" in sec


def test_mode_sections_render_pair_efficiencies():
    bench = _bench()
    for mode, marker in (("local", "local["), ("localcluster", "local-cluster[")):
        if not os.path.isfile(bench._scaling_json_path(mode)):
            pytest.skip(f"no saved {mode} sweep in this tree")
        sec = bench._mode_section(mode)
        assert marker in sec
        assert "triples/sec eff" in sec
        assert "partition-invariance" in sec


def test_committed_bench_md_matches_fresh_render():
    bench = _bench()
    if not os.path.isfile(bench._scaling_json_path("local")):
        pytest.skip("no saved sweep in this tree")
    with open(os.path.join(REPO, "BENCH.md")) as f:
        committed = f.read()
    fresh = bench._render_bench_md()  # pure: the tree is not touched
    assert committed == fresh, (
        "BENCH.md drifted from its generator — edit the template in "
        "bench._write_bench_md/_probe_section/_mode_section instead of "
        "the markdown, then regenerate"
    )


def _fake_result(cores):
    thr = 10000.0 * cores  # perfectly linear fake
    return {
        "cores": cores,
        "n_turns": 1000,
        "n_mentions": 2000,
        "n_triples": 5000,
        "sec": round(1000.0 / thr, 3),
        "turns_per_sec": thr,
        "triples_per_sec": 5 * thr,
    }


def _bench_sandboxed(tmp_path, monkeypatch, cores="2,8", repeats=1):
    """Import a fresh bench module with its file outputs redirected
    into tmp_path and the per-config worker faked — run_scaling's
    control flow (resume, partial cleanup, summary labels) without
    any Spark."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CORES", cores)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", str(repeats))
    bench = _bench()
    monkeypatch.setattr(
        bench, "_scaling_json_path",
        lambda mode: str(tmp_path / f"SCALING_{mode}.json"),
    )
    monkeypatch.setattr(bench, "_write_bench_md", lambda: None)
    calls = []

    def fake_worker(c, local_cluster=False):
        calls.append(c)
        return _fake_result(c)

    monkeypatch.setattr(bench, "_one_worker", fake_worker)
    return bench, calls


def test_run_scaling_resumes_from_partial_and_cleans_it(
    tmp_path, monkeypatch, capsys
):
    import json

    bench, calls = _bench_sandboxed(tmp_path, monkeypatch)
    partial = tmp_path / "SCALING_local.json.partial"
    partial.write_text(json.dumps({"2": _fake_result(2)}))
    bench.run_scaling(False)
    assert calls == [8], "config 2 must come from the partial checkpoint"
    assert not partial.exists(), "partial superseded by the final JSON"
    rec = json.loads((tmp_path / "SCALING_local.json").read_text())
    assert rec["summary"]["efficiency_triples_2_to_8"] == 1.0
    assert "local2_turns_per_sec" in rec["summary"]["queries"]


def test_run_scaling_localcluster_mode_labels_and_odd_cores(
    tmp_path, monkeypatch, capsys
):
    import json

    bench, calls = _bench_sandboxed(tmp_path, monkeypatch)
    bench.run_scaling(True)
    rec = json.loads((tmp_path / "SCALING_localcluster.json").read_text())
    assert "localcluster2_turns_per_sec" in rec["summary"]["queries"], (
        "summary keys must name the mode actually run"
    )

    bench2, _ = _bench_sandboxed(tmp_path, monkeypatch, cores="3,12")
    with pytest.raises(SystemExit):
        bench2.run_scaling(True)  # 3 not divisible by 2-core executors
    bench2.run_scaling(False)  # local mode takes any core count
