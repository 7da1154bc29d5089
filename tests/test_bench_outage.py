"""bench.py outage contract (VERDICT r3 #2): a dead TPU backend must
never zero a round again. tpu_devices retries with backoff, and any
failure still prints ONE parseable JSON line on stdout."""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tpu_devices_retries_then_raises(monkeypatch):
    bench = _load_bench()
    calls = []

    def dead(*a, **k):
        calls.append(1)
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench.jax, "devices", dead)
    with pytest.raises(RuntimeError):
        bench.tpu_devices(retries=3, backoff_s=0.01)
    assert len(calls) == 3


def test_tpu_devices_recovers_mid_retry(monkeypatch):
    bench = _load_bench()
    state = {"n": 0}

    def flaky(*a, **k):
        state["n"] += 1
        if state["n"] < 2:
            raise RuntimeError("UNAVAILABLE")
        return ["dev0"]

    monkeypatch.setattr(bench.jax, "devices", flaky)
    assert bench.tpu_devices(retries=3, backoff_s=0.01) == ["dev0"]


def test_bench_failure_emits_parseable_json():
    """End-to-end: a crashing run still prints one valid JSON line with
    value=null and an error field, and exits 0."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               BENCH_INIT_RETRIES="1", BENCH_INIT_BACKOFF_S="0.01")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--quick",
         "--scene", "/nonexistent.obj"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "error" in rec and "FileNotFoundError" in rec["error"]
    assert rec["metric"].startswith("primary_mrays")
