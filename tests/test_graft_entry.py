"""Driver-contract tests for __graft_entry__.py.

Round 1's MULTICHIP_r01.json recorded ok:false because dryrun_multichip
probed jax.devices() before any CPU-device config could apply (the axon
sitecustomize preimports a single-chip TPU backend).  The fix re-execs a
scrubbed subprocess; this test calls it EXACTLY the way the driver does —
from an environment whose PYTHONPATH still points at the axon sitecustomize
— so a regression fails in CI, not in the driver run.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_invocation():
    env = dict(os.environ)
    # pytest's conftest may have scrubbed things; restore the hostile
    # driver-like environment explicitly.
    env["PYTHONPATH"] = "/root/.axon_site"
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "dryrun_multichip(8) ok" in proc.stdout, proc.stdout[-3000:]
