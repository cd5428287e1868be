"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test-env discipline (tiered fast-CPU tests,
`diffusers/src/diffusers/utils/testing_utils.py:122-190`): fast tests run on
the CPU backend with 8 virtual devices so all sharding/collective code paths
execute; `RUN_SLOW=1` unlocks big-model tests.
"""

import os

# Must happen before jax import anywhere. Force (not setdefault): the outer
# environment pins JAX_PLATFORMS to the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

# a pytest plugin imports jax before this conftest runs, so JAX_PLATFORMS from
# os.environ is already baked into jax.config — override it directly (the
# backend itself initializes lazily, so this still takes effect)
jax.config.update("jax_platforms", "cpu")

# f32 parity oracles need true-f32 matmuls/convs; JAX's default matmul
# precision downconverts (bf16 passes) even on CPU. The training path opts
# into bf16 explicitly via dtype policy instead.
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: UNet compiles dominate test wall-time otherwise.
# Lives under ~/.cache (NOT /tmp, which is wiped between sessions on this box
# — a /tmp cache made the measured <600 s budget hold only on warm re-runs).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/baddiffusion_tpu/jax-tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: needs RUN_SLOW=1 (big models / many steps)")
    config.addinivalue_line("markers", "reference: needs /root/reference checkout for parity checks")


def pytest_collection_modifyitems(config, items):
    run_slow = os.environ.get("RUN_SLOW", "0") == "1"
    has_reference = os.path.isdir("/root/reference")
    skip_slow = pytest.mark.skip(reason="slow test: set RUN_SLOW=1 to run")
    skip_ref = pytest.mark.skip(reason="reference checkout not available")
    for item in items:
        if "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)
        if "reference" in item.keywords and not has_reference:
            item.add_marker(skip_ref)
