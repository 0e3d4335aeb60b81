"""Test harness config: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh, SURVEY §4), enable x64 so physics oracle tests
can compare against C-MuJoCo at f64 fidelity."""

import os

# Stash the pre-pytest JAX env (write-once: this module can be imported twice,
# as "conftest" by pytest and as "tests.conftest" by tests) so subprocess
# tests (test_megakernel_tpu) can reach the session's real accelerator.
for _k in ("JAX_PLATFORM_NAME", "JAX_PLATFORMS", "XLA_FLAGS"):
    os.environ.setdefault("_ODPT_ORIG_" + _k, os.environ.get(_k, "<unset>"))

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):  # this module imports twice
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + _FLAG

import jax  # noqa: E402

# The harness may pre-register a TPU backend (e.g. JAX_PLATFORMS=axon via
# sitecustomize) that overrides the env vars above; force CPU post-import too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/odp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pathlib  # noqa: E402

import pytest  # noqa: E402

XMLS = (
    pathlib.Path(__file__).resolve().parents[1]
    / "open_duck_playground_tpu"
    / "models"
    / "open_duck_mini_v2"
    / "xmls"
)


@pytest.fixture(scope="session")
def xml_dir():
    return XMLS
