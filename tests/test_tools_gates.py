"""Pins for the scripted evidence gates (round 12): the sf1 probe's
baseline table must track the live registry, and the tools' CLI
parsing must fail loudly, not silently."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(HERE, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sf1_probe_baseline_keys_exist_in_registry():
    """A renamed/removed registry key must break HERE, not silently
    shrink the probe's coverage at the next sf1 run."""
    from data_pipeline_bigquery_spark.queries import registry

    probe = _load("sf1_probe")
    reg = registry()
    missing = [k for k in probe.BASELINE_SEC if k not in reg]
    assert not missing, f"sf1_probe.BASELINE_SEC keys not in registry: {missing}"
    assert all(v > 0 for v in probe.BASELINE_SEC.values())


def test_sf1_probe_rejects_unknown_key_and_bad_flags():
    env = {**os.environ, "SPARK_GRAFT_CPUS": "2"}
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "sf1_probe.py"),
         "/tmp/sf1_nonexistent_ok", "no_such_key"],
        capture_output=True, text=True, env=env, cwd=HERE,
    )
    assert r.returncode == 2 and "no recorded sf1 baseline" in r.stderr
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "sf1_probe.py"),
         "--drift"],
        capture_output=True, text=True, env=env, cwd=HERE,
    )
    assert r.returncode == 2 and "--drift" in r.stderr


def test_invariance_sweep_conf_and_keys_parsing_fail_loudly():
    tool = os.path.join(HERE, "tools", "partition_invariance_sweep.py")
    for args, needle in (
        (["/tmp/x", "/tmp/y", "--conf"], "missing value"),
        (["/tmp/x", "/tmp/y", "--conf", "noequals"], "key=value"),
        (["/tmp/x", "/tmp/y", "--keys"], "missing value"),
    ):
        r = subprocess.run(
            [sys.executable, tool, *args],
            capture_output=True, text=True, cwd=HERE,
        )
        assert r.returncode == 2, (args, r.returncode)
        assert needle in r.stderr, (args, r.stderr)
