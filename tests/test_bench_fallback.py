"""bench.py must emit a parseable JSON line even when the backend is down.

Round-3 regression (VERDICT r3 weak #1 / next #1): the driver's bench run
hit the axon tunnel outage, `jax.devices()` raised UNAVAILABLE before any
output, and BENCH_r03.json recorded `rc:1 parsed:null` — a whole round of
perf work with no official number. These tests run bench.py in a scrubbed
subprocess with a bogus JAX_PLATFORMS (backend init fails instantly, like
the outage) and assert the fallback contract: rc == 0 and stdout's last
line is valid JSON with the driver's schema.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env(**extra):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "CFEN_"))}
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize preimport
    env.update(extra)
    return env


def _run_bench(env):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)


def _last_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout at all: {stdout!r}"
    return json.loads(lines[-1])


def test_bench_backend_init_failure_emits_json():
    env = _scrubbed_env(JAX_PLATFORMS="bogus_backend",
                        CFEN_BENCH_INIT_RETRY_S="0")  # no retries: terminal
    res = _run_bench(env)
    rec = _last_json_line(res.stdout)
    assert res.returncode == 0, (res.stdout, res.stderr)
    assert rec["metric"] == "512x512_dehaze_images_per_sec_per_chip"
    assert rec["value"] == 0.0 and rec["unit"] == "img/s"
    assert rec["vs_baseline"] == 0.0
    assert "backend init failed" in rec["note"]


def test_bench_backend_init_retries_then_gives_up():
    # 5 s budget with 1 s sleeps: at least one re-exec retry happens (the
    # stderr breadcrumb proves it), then the fallback line still appears.
    env = _scrubbed_env(JAX_PLATFORMS="bogus_backend",
                        CFEN_BENCH_INIT_RETRY_S="5",
                        CFEN_BENCH_INIT_SLEEP_S="1")
    res = _run_bench(env)
    rec = _last_json_line(res.stdout)
    assert res.returncode == 0, (res.stdout, res.stderr)
    assert rec["value"] == 0.0
    assert "retrying in" in res.stderr, res.stderr


def test_bench_generic_crash_emits_json():
    # Any unexpected exception after backend init must also degrade to the
    # JSON schema (the __main__ guard), not a bare traceback. Force one by
    # pointing the compilation cache at an unwritable path? Simpler: break
    # the model import path via a bogus argv handled pre-backend — instead
    # run with CPU backend but an invalid --batch that trips argparse...
    # argparse exits 2 by design; the contract covers *exceptions*, so
    # simulate one with a corrupt CFEN env the model layer validates.
    env = _scrubbed_env(JAX_PLATFORMS="cpu", CFEN_BENCH_FORCE_CRASH="1")
    res = _run_bench(env)
    rec = _last_json_line(res.stdout)
    assert res.returncode == 0, (res.stdout, res.stderr)
    assert rec["value"] == 0.0
    assert "forced crash" in rec["note"]
