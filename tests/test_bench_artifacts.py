"""Bench artifacts: writers must merge their sections, never clobber
each other's (round 3 shipped BENCH_SCALING.json with the passing skew
record overwritten by the later scaling run)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_merge_preserves_other_sections(tmp_path):
    from bench_scaling import merge_bench_json
    p = str(tmp_path / "b.json")
    # skew writer first, then scaling writer (the round-3 loss ordering)
    merge_bench_json(p, {"skew": {"value": 1.069, "pass_1p3x": True}})
    merge_bench_json(p, {"metric": "scaling", "efficiency": 0.95})
    with open(p) as f:
        d = json.load(f)
    assert d["skew"]["pass_1p3x"] is True
    assert d["efficiency"] == 0.95
    # and the reverse order also keeps both
    merge_bench_json(p, {"skew": {"value": 1.1, "pass_1p3x": True}})
    with open(p) as f:
        d = json.load(f)
    assert d["efficiency"] == 0.95 and d["skew"]["value"] == 1.1


def test_merge_survives_corrupt_file(tmp_path):
    from bench_scaling import merge_bench_json
    p = str(tmp_path / "b.json")
    with open(p, "w") as f:
        f.write("{not json")
    d = merge_bench_json(p, {"a": 1})
    assert d == {"a": 1}


def test_shipped_artifact_has_both_sections():
    with open(os.path.join(REPO, "BENCH_SCALING.json")) as f:
        d = json.load(f)
    assert "efficiency" in d, "scaling section missing"
    assert "skew" in d and "pass_1p3x" in d["skew"], "skew section missing"
