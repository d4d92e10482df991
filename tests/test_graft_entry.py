"""The driver entry points must be hermetic.

Rounds 1 and 2 both recorded dryrun_multichip ok:false in the driver
artifact (MULTICHIP_r0{1,2}.json): eager ops inside the example-chunk
builder dispatched to the process's default backend (the TPU tunnel)
before the CPU mesh existed, and the host-platform device-count flag was
appended to XLA_FLAGS too late when any jax work had already run
in-process.  dryrun_multichip now runs its whole body in a subprocess
with a scrubbed CPU-only environment; these tests reproduce both failure
modes against the fixed entry point.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_in_poisoned_process():
    """Round-2 latent bug: a parent process whose CPU client was already
    initialized with ONE device (XLA_FLAGS unset) calls
    dryrun_multichip(8).  The old in-process implementation appended the
    device-count flag after the client existed and died on its own
    assert; the subprocess implementation must pass."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""   # sitecustomize: skip TPU registration
    env["XLA_FLAGS"] = ""              # parent CPU client: 1 device
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax\n"
        "assert len(jax.devices()) < 8, 'precondition: poisoned parent'\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('POISONED-PARENT-OK')\n"
    )
    p = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1800)
    assert p.returncode == 0, f"stdout:\n{p.stdout}\nstderr:\n{p.stderr}"
    assert "POISONED-PARENT-OK" in p.stdout


def test_dryrun_scrubs_env():
    """The worker env must force the CPU platform and the device count no
    matter what the caller's env says (a TPU-backend caller is the driver
    reality)."""
    import __graft_entry__ as g
    # simulate hostile caller env vars; the subprocess must override them
    old = {k: os.environ.get(k) for k in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        os.environ["JAX_PLATFORMS"] = "definitely_not_a_platform"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        g.dryrun_multichip(4)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
