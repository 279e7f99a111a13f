"""Test configuration.

Forces the CPU backend with a virtual 8-device mesh (the TPU analogue of a
fake backend — SURVEY.md §4) so shard_map tile assembly and ICI-style
reductions are testable without a TPU pod, and enables the persistent
compilation cache because XLA compiles are the dominant test cost on this
single-core CI host.

Must set env vars before jax imports — hence module-level, first thing.
"""

import os
import sys

# Force CPU: the environment pins JAX_PLATFORMS=axon (the TPU tunnel)
# globally AND its sitecustomize imports jax at interpreter startup, so env
# vars alone are too late — jax.config.update below does the real work.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 16 virtual devices: most tests run 8-device meshes (devices[:8] are
    # the same objects either way), and the 16-device mesh test needs the
    # headroom.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16"
    ).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The sitecustomize preimports jax, so the env var above was read-too-late
# for jax's import-time config scan; the shared helper does the
# config.update that actually turns the disk cache on.  min 0.0: CI
# shapes are tiny but recur every run.
from win32_raytracer_tpu._cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]),
                     min_compile_secs=0.0)
assert jax.device_count() >= 8, (
    "expected the 8-device virtual CPU mesh; got "
    f"{jax.devices()} — XLA_FLAGS was set too late?")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
