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
