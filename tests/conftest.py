"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize force-registers a TPU PJRT plugin in
every Python process (and sets JAX_PLATFORMS=axon), so a plain env-var
default is not enough — we must both set the env before `import jax` AND
override the config in-process."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep the TPU-tunnel plugin from hijacking the test process.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Build the native MIDI decoder if it isn't there (fresh clones): the
# differential Python-vs-C++ byte-equality tests would otherwise SKIP
# silently and the native coverage would vanish from CI.  Best-effort —
# a missing toolchain degrades back to the documented skip.
_native_so = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libdeepj_midi.so")
if not os.path.exists(_native_so):
    import subprocess
    subprocess.run(["make", "-C", os.path.dirname(_native_so)],
                   check=False, capture_output=True)
