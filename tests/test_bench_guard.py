"""Unit tests for bench.py's device-claim guard.

The guard must emit ONE well-formed failure JSON line (never a traceback,
never a silent hang) when the axon tunnel is down, because the harness
runs `python bench.py` unattended at the round boundary.  The two outage
modes it covers:

* fast UNAVAILABLE failures (relay up, TPU side down) — bounded
  subprocess probes, because a failed in-process backend init poisons
  jax's backend cache for the life of the process;
* an indefinitely wedged claim leg — the in-process watchdog.

The probe subprocess is mocked here (tests run on the CPU conftest
backend; the child would try the real axon platform).  The live outage
path was exercised against an actual tunnel outage on 2026-08-18:
`PMF_TPU_BENCH_CLAIM_RETRY_S=90 python bench.py` printed the
tpu_unavailable JSON line and exited 3 at the window edge.
"""

import json
import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class _Exit(Exception):
    pass


def test_guard_passes_through_on_healthy_probe(monkeypatch):
    calls = []

    def ok_run(*a, **k):
        calls.append(a)
        return types.SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(subprocess, "run", ok_run)
    devs = bench._device_init_guard(timeout_s=60)
    assert len(calls) == 1
    assert devs  # conftest CPU backend: jax.devices() non-empty


def test_guard_emits_failure_json_when_probes_fail(monkeypatch, capsys):
    def bad_run(*a, **k):
        return types.SimpleNamespace(
            returncode=1, stdout="",
            stderr="RuntimeError: Unable to initialize backend 'axon'")

    def fake_exit(code):
        raise _Exit(code)

    monkeypatch.setattr(subprocess, "run", bad_run)
    monkeypatch.setattr(bench.os, "_exit", fake_exit)
    # > 1s so the first probe actually runs (the guard floors the final
    # deadline check at 1s of remaining window)
    monkeypatch.setenv("PMF_TPU_BENCH_CLAIM_RETRY_S", "1.5")
    with pytest.raises(_Exit):
        bench._device_init_guard(timeout_s=60)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["detail"]["failure"] == "tpu_unavailable"
    assert "Unable to initialize backend" in rec["detail"]["message"]


def test_guard_probe_disabled_by_env(monkeypatch):
    def boom(*a, **k):  # probing disabled -> subprocess must not run
        raise AssertionError("probe ran with retry window 0")

    monkeypatch.setattr(subprocess, "run", boom)
    monkeypatch.setenv("PMF_TPU_BENCH_CLAIM_RETRY_S", "0")
    assert bench._device_init_guard(timeout_s=60)
