"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (no TPU pod needed), per the multi-host test strategy in
SURVEY.md §4."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The hosted TPU plugin ("axon") ignores JAX_PLATFORMS; the config update is
# what actually pins tests to the virtual CPU mesh. `make test_tpu` sets
# SDTPU_TESTS_ON_TPU=1 to leave the real chip visible for the @pytest.mark.tpu
# hardware parity suite (Mosaic compile path, interpret=False).
ON_TPU = os.environ.get("SDTPU_TESTS_ON_TPU") == "1"
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import json
import pathlib

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop live compiled executables between test modules. The XLA CPU
    JIT segfaults deterministically once a single process accumulates the
    full suite's compile volume (reproduced: align + banded_pallas modules
    then ONE more jit compile crashes in backend_compile_and_load);
    releasing executables at module boundaries keeps the process under
    that cliff. Costs a few cross-module recompiles, all cache-warm."""
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if ON_TPU:
        return
    skip_tpu = pytest.mark.skip(
        reason="needs real TPU hardware; run via `make test_tpu`"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
TEST_DATA = pathlib.Path(__file__).parent.parent / "stringdecomposer_tpu" / "test_data"


@pytest.fixture(scope="session")
def random_cases():
    # two independently seeded reference-binary fixture sets
    cases = []
    for name in ["random_cases.json", "random_cases_b.json"]:
        with open(FIXTURES / name) as f:
            cases.extend(json.load(f))
    return cases


@pytest.fixture(scope="session")
def edlib_cases():
    cases = []
    for name in ["edlib_cases.json", "edlib_cases_b.json"]:
        with open(FIXTURES / name) as f:
            cases.extend(json.load(f))
    return cases


@pytest.fixture(scope="session")
def test_data_dir():
    return TEST_DATA
