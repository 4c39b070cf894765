"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``); real-TPU execution is
covered by bench.py / the driver's compile checks.
"""
import os

# Force-override: the ambient environment may pin JAX_PLATFORMS to a real
# accelerator (e.g. 'axon'); unit tests always run on the virtual CPU mesh.
# Set NERF_QA_TPU_TESTS=1 to run the suite on real hardware instead.
if not os.environ.get("NERF_QA_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
# hermetic: CLI mains under test must not write the user's persistent
# XLA cache (tests of the cache itself monkeypatch this explicitly)
os.environ.setdefault("NERF_QA_TPU_COMPILE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("NERF_QA_TPU_TESTS"):
    # The axon plugin ignores the env var; the config update is effective.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
