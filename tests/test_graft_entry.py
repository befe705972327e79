"""The driver-facing entry points must be self-sufficient.

Round-1 regression: the driver ran `dryrun_multichip(8)` in a process bound
to the single-chip axon platform and it crashed trying to build an 8-device
mesh (MULTICHIP_r01.json). The wrapper must now provision its own virtual
CPU mesh via a subprocess whenever the host process lacks devices.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    # Parent subprocess sees only 1 CPU device -> wrapper must re-exec with
    # a virtual 8-device mesh and still succeed.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep sitecustomize from
    # re-registering the tunnel backend over JAX_PLATFORMS
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DP train step OK" in proc.stdout
    assert "DP4xTP2 train step OK" in proc.stdout
