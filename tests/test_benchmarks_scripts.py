"""Smoke the promoted benchmark scripts (benchmarks/ — the evidence
generators DECISIONS.md cites). They are TPU scripts with top-level
run-on-import code, so the CPU-tier smoke checks structure, not
numbers: each parses, documents its usage, and targets the shared
repo-root compile cache (a benchmarks-local cache would silently cold
compile everything)."""

import ast
import glob
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(ROOT, "benchmarks", "*.py")))


def test_benchmark_scripts_present():
    names = {os.path.basename(p) for p in SCRIPTS}
    assert {"pixel_e2e.py", "pixel_phases.py", "keyframe_phases.py",
            "strip_config5.py", "flow_ceiling.py"} <= names


def test_benchmark_scripts_parse_with_docstring_and_shared_cache():
    for path in SCRIPTS:
        src = open(path).read()
        tree = ast.parse(src)
        assert ast.get_docstring(tree), f"{path}: missing usage docstring"
        assert 'os.path.join(_ROOT, ".jax_cache")' in src, (
            f"{path}: must use the repo-root shared compile cache")
        assert "enable_tpu_compile_cache" in src, (
            f"{path}: cache must be TPU-scoped (utils/compile_cache.py)")


def test_no_scratch_scripts_at_root():
    assert not glob.glob(os.path.join(ROOT, ".scratch_*.py"))
