"""Unit tests for bench.py's deadline supervisor (parent_main).

The parent process never imports jax; its job is a small state machine:
bank a TPU number with the smallest-program rung first, then give the
fused headline attempt the remaining deadline, with a Pallas-stripped
rescue rung on outright banker failure and a parallel CPU fallback
(reference behavior documented in bench.py's module docstring and
BASELINE.md "Official bench captures"). These tests script the worker
subprocesses (plain /bin/sh sleep/exit stand-ins — no jax, no TPU) and
assert which attempt's record is emitted and which attempts ever run.

Production floors every TPU slice at 60 s (attempts are worth at least
one compile), so timeout scenarios use a scripted per-attempt slice
override instead of waiting out real slices.
"""

import json
import os
import shlex
import signal
import subprocess
import time

import pytest

import bench


def _fake_start(script, started):
    """Build an _Attempt.start replacement driven by a per-name script.

    script[name] = (delay_s, outcome[, slice_override_s]) with outcome in
    ok|fail|hang. ``started`` records start order for assertions.
    """

    def start(self, slice_s, workdir):
        delay, outcome, *rest = script[self.name]
        started.append((self.name, slice_s))
        self.outfile = os.path.join(workdir, f"{self.name}.json")
        if outcome == "ok":
            payload = json.dumps({
                "metric": "end_to_end_images_per_sec",
                "value": 100.0 + len(started),
                "unit": "images/s",
                "vs_baseline": 1.0,
                "degraded": self.platform == "cpu",
                "name": self.name,
            })
            cmd = ["sh", "-c",
                   f"sleep {delay}; printf %s {shlex.quote(payload)} > "
                   f"{shlex.quote(self.outfile)}"]
        elif outcome == "fail":
            cmd = ["sh", "-c", f"sleep {delay}; exit 1"]
        else:  # hang until killed
            cmd = ["sleep", "3600"]
        self.deadline_at = time.time() + (rest[0] if rest else slice_s)
        self.proc = subprocess.Popen(cmd)
        self.status = "running"

    return start


@pytest.fixture()
def run_parent(monkeypatch, capsys):
    """Run parent_main with scripted workers; return (record, started)."""
    saved = {s: signal.getsignal(s) for s in (signal.SIGTERM, signal.SIGINT)}

    def run(script, env=None, deadline="60"):
        monkeypatch.setenv("BENCH_DEADLINE", deadline)
        for k, v in (env or {}).items():
            monkeypatch.setenv(k, v)
        started = []
        monkeypatch.setattr(bench._Attempt, "start",
                            _fake_start(script, started))
        monkeypatch.setattr(bench, "_START", time.time())
        # shrink the poll period so scenarios finish fast
        real_sleep = time.sleep
        monkeypatch.setattr(bench.time, "sleep", lambda s: real_sleep(0.05))
        assert bench.parent_main() == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out), started

    yield run
    for s, h in saved.items():
        signal.signal(s, h)


def test_happy_path_banker_then_headline(run_parent):
    record, started = run_parent({
        "cpu_fallback": (0.1, "ok"),
        "tpu_banker": (0.2, "ok"),
        "tpu_primary": (0.2, "ok"),
    })
    # headline (fused) record wins over the banked three-program number
    assert record["name"] == "tpu_primary"
    assert record["degraded"] is False
    # bank-first ordering: banker starts before the headline attempt;
    # the rescue rung never runs when the banker lands
    names = [n for n, _ in started]
    assert names.index("tpu_banker") < names.index("tpu_primary")
    assert "tpu_rescue3" not in names


def test_banked_number_survives_headline_timeout(run_parent):
    record, started = run_parent({
        "cpu_fallback": (0.1, "ok"),
        "tpu_banker": (0.2, "ok"),
        "tpu_primary": (0.0, "hang", 0.5),  # killed at its (scripted) slice
    })
    # the hung headline is killed; the banked three-program number is final
    assert record["name"] == "tpu_banker"
    assert record["degraded"] is False
    assert [n for n, _ in started].count("tpu_primary") == 1


def test_banker_failure_runs_rescue_and_skips_headline(run_parent):
    record, started = run_parent({
        "cpu_fallback": (0.1, "ok"),
        "tpu_banker": (0.1, "fail"),
        "tpu_rescue3": (0.2, "ok"),
    }, deadline="200")  # the rescue rung needs >90 s of headroom
    # outright (fast) banker failure = likely kernel/compile error: the
    # Pallas-stripped rescue rung runs, the big fused program is skipped
    # (it contains the same kernel)
    assert record["name"] == "tpu_rescue3"
    names = [n for n, _ in started]
    assert "tpu_primary" not in names


def test_banker_timeout_falls_back_to_cpu(run_parent):
    record, started = run_parent({
        "cpu_fallback": (0.1, "ok"),
        "tpu_banker": (0.0, "hang", 0.5),  # slice expires -> timeout
    })
    # a window too slow for the smallest programs: no further TPU attempt
    # (the killed banker wedges the grant); the CPU number is emitted with
    # the degraded marker
    assert record["name"] == "cpu_fallback"
    assert record["degraded"] is True
    names = [n for n, _ in started]
    assert "tpu_primary" not in names and "tpu_rescue3" not in names


def test_banker_disabled_starts_headline_immediately(run_parent):
    record, started = run_parent({
        "cpu_fallback": (0.1, "ok"),
        "tpu_primary": (0.2, "ok"),
    }, env={"BENCH_BANKER": "0"})
    assert record["name"] == "tpu_primary"
    names = [n for n, _ in started]
    assert "tpu_banker" not in names and "tpu_rescue3" not in names


def test_everything_fails_emits_degraded_stub(run_parent):
    record, _ = run_parent({
        "cpu_fallback": (0.1, "fail"),
        "tpu_banker": (0.1, "fail"),
        "tpu_rescue3": (0.1, "fail"),
    })
    assert record["degraded"] is True
    assert record["value"] is None
    assert record["metric"] == "end_to_end_images_per_sec"
