"""bench.py driver-contract tests (no device, no jax): the parent process
must keep the headline e2e JSON as the LAST line and exit cleanly whether a
metric hangs past its budget or the driver SIGTERMs the whole run mid-way.
Uses bench.py's IBL_BENCH_FAKE instrumentation (canned child metrics).

These pin the round-2 ADVICE items: the kill-safety claim is now a committed
subprocess test, and a SIGTERM exit reports 128+15 instead of 0."""

import json
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _run(env_extra, timeout=60):
    env = dict(os.environ, IBL_BENCH_FAKE="1", **env_extra)
    return subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=timeout)


def _json_lines(out):
    lines = []
    for raw in out.splitlines():
        raw = raw.strip()
        if raw.startswith("{") and raw.endswith("}"):
            lines.append(json.loads(raw))
    return lines


def test_happy_path_headline_last_rc0():
    r = _run({})
    assert r.returncode == 0, r.stdout + r.stderr
    lines = _json_lines(r.stdout)
    metrics = [ln["metric"] for ln in lines]
    assert "cascade_frames_per_sec" in metrics
    assert "vit_embed_frames_per_sec" in metrics
    assert lines[-1]["metric"] == "e2e_localisation_fps_per_chip"
    assert lines[-1]["value"] == 42.0


def test_hung_cascade_is_killed_and_skipped():
    """A cascade child stuck in a 'remote compile' far past the wall budget
    is killed; a labeled skip line appears; headline still last; rc=0."""
    t0 = time.monotonic()
    r = _run({"IBL_BENCH_FAKE_CASCADE_SLEEP": "3600",
              "IBL_BENCH_BUDGET_S": "8"})
    assert time.monotonic() - t0 < 45
    assert r.returncode == 0, r.stdout + r.stderr
    lines = _json_lines(r.stdout)
    cascade = [ln for ln in lines if ln["metric"] == "cascade_frames_per_sec"]
    assert cascade and "SKIPPED" in cascade[0]["unit"]
    assert lines[-1]["metric"] == "e2e_localisation_fps_per_chip"


def test_sigterm_reprints_headline_and_exits_128_15():
    """Driver-side timeout kill mid-run: last line must be the headline
    JSON and the exit status the conventional 128+SIGTERM (round-2 ADVICE:
    os._exit(0) masked interrupted runs as successes)."""
    env = dict(os.environ, IBL_BENCH_FAKE="1",
               IBL_BENCH_FAKE_CASCADE_SLEEP="3600",
               IBL_BENCH_BUDGET_S="3600")
    proc = subprocess.Popen([sys.executable, BENCH], env=env,
                            stdout=subprocess.PIPE, text=True)
    # wait until the headline line is on the wire, then "driver timeout"
    deadline = time.monotonic() + 30
    seen = []
    for raw in proc.stdout:
        seen.append(raw)
        if "e2e_localisation_fps_per_chip" in raw:
            break
        assert time.monotonic() < deadline
    time.sleep(0.5)                      # cascade child is now hanging
    proc.send_signal(signal.SIGTERM)
    try:
        rest = proc.stdout.read()
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert proc.returncode == 128 + signal.SIGTERM
    lines = _json_lines("".join(seen) + rest)
    assert lines[-1]["metric"] == "e2e_localisation_fps_per_chip"
    assert lines[-1]["value"] == 42.0


def test_failed_headline_exits_nonzero_with_labeled_line():
    """r3 ADVICE: a run whose headline child crashed must not exit 0 with a
    fabricated value-0.0 line that parses as a plausible measurement."""
    r = _run({"IBL_BENCH_FAKE_E2E_FAIL": "1"})
    assert r.returncode != 0
    lines = _json_lines(r.stdout)
    assert lines[-1]["metric"] == "e2e_localisation_fps_per_chip"
    assert lines[-1]["value"] == 0.0
    assert "did not complete" in lines[-1]["unit"]


def test_real_pipeline_metric_composed_from_children():
    """real_pipeline_fps = 1/(1/cascade + 1/embed + 1/localise) over the
    fake children's canned rates (42, 5, 100 fps)."""
    r = _run({})
    assert r.returncode == 0, r.stdout + r.stderr
    lines = _json_lines(r.stdout)
    real = [ln for ln in lines if ln["metric"] == "real_pipeline_fps"]
    assert real, lines
    expect = 1.0 / (1.0 / 5.0 + 1.0 / 42.0 + 1.0 / 100.0)
    assert abs(real[0]["value"] - expect) < 1e-2
    assert real[0]["vs_baseline"] is not None
