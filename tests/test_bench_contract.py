"""Guards the bench.py driver contract against drift in the sweep
subprocesses it parses.

bench.py shells out to ``benchmarks/bench_eval_text_quant.py --json``
and maps its ``mode`` labels into the archived ``quant_eval_text`` key
(BENCH_r{N}.json). A silent rename on either side would turn the
archived key into all-"no result" rows without failing anything — these
tests pin the label mapping and the parser behavior (noise tolerance,
speedup computation, timeout fallback) on CPU, no TPU needed.
"""

import json
import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from benchmarks import bench_eval_text_quant as betq  # noqa: E402


def _row(mode, ips, ms):
    return json.dumps({"mode": mode, "workload": "cocoop_eval",
                       "batch": 64, "ms_per_batch": ms,
                       "images_per_s": ips, "warmup_s": 30.0})


def _with_stubbed_run(monkeypatch, stdout, timeout=False):
    def fake_run(*a, **k):
        if timeout:
            raise subprocess.TimeoutExpired(cmd=a[0], timeout=1,
                                            output=stdout.encode())
        return types.SimpleNamespace(stdout=stdout, returncode=0)
    monkeypatch.setattr(subprocess, "run", fake_run)


def test_mode_labels_cover_bench_mapping():
    # every label bench.py expects must exist in the sweep's MODES, and
    # the --cocoop-only subset must keep exactly those labels
    sweep_labels = {m[0] for m in betq.MODES}
    expected = {"bf16", "w8a8_text", "w8a8_text+vision"}
    assert expected <= sweep_labels
    subset = {m[0] for m in betq.MODES if m[0] != "int8_text"}
    assert subset == expected


def test_quant_eval_text_parses_rows_and_speedup(monkeypatch):
    stdout = "\n".join([
        _row("bf16", 751.4, 85.2),
        "non-json progress noise",
        _row("w8a8_text", 913.5, 70.1),
        _row("w8a8_text+vision", 975.6, 65.6),
    ])
    _with_stubbed_run(monkeypatch, stdout)
    out = bench._quant_eval_text()
    assert out["bf16"]["images_per_s"] == 751.4
    assert out["w8a8_text_vision"]["images_per_s"] == 975.6
    assert out["speedup"] == pytest.approx(913.5 / 751.4, abs=1e-3)


def test_quant_eval_text_timeout_keeps_partial_rows(monkeypatch):
    # a tunnel stall mid-sweep must not lose the rows already printed
    _with_stubbed_run(monkeypatch, _row("bf16", 751.4, 85.2),
                      timeout=True)
    out = bench._quant_eval_text()
    assert out["bf16"]["images_per_s"] == 751.4
    assert out["w8a8_text"] == {"skipped": "eval-text budget exhausted"}
    assert "speedup" not in out


def test_quant_eval_text_env_skip(monkeypatch):
    monkeypatch.setenv("BENCH_SKIP_EVAL_TEXT", "1")
    assert bench._quant_eval_text() == {"skipped": True}
