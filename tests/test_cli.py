"""CLI smoke tests (CPU backend, tiny workloads)."""

import json
import subprocess
import sys

import pytest

_BASE = [sys.executable, "-m", "tpusparse.cli"]
_TINY = ["--cpu", "--m", "256", "--n", "256"]


def _run(args):
    return subprocess.run(_BASE + args, capture_output=True, text=True,
                          timeout=240)


def test_check_exit_code_reflects_results():
    r = _run(["check", *_TINY, "--kernels", "dense_xla,sell_pallas"])
    assert r.returncode == 0, r.stderr[-500:]
    assert "OK" in r.stdout


def test_bench_json_records():
    r = _run(["bench", *_TINY, "--kernels", "dense_xla", "--format", "json"])
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["kernel"] == "dense_xla" and rec["m"] == 256
    assert rec["us"] > 0


def test_unknown_kernel_rejected():
    r = _run(["check", *_TINY, "--kernels", "nope"])
    assert r.returncode != 0
    assert "unknown kernels" in (r.stdout + r.stderr)
