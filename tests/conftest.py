"""Test config: force an 8-device virtual CPU mesh (no TPU needed).

Pallas kernels run in interpret mode on CPU (tpukern.core.config picks this
automatically); multi-chip sharding tests use the 8 virtual devices.
"""

import os

# The ambient environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via a
# sitecustomize that overrides env vars, so the env route doesn't work —
# force the platform through jax.config after import instead. Tests run on
# the virtual 8-device CPU mesh unless TPUKERN_TEST_PLATFORM=tpu is set
# (opt-in on-device kernel tests).
_platform = os.environ.get("TPUKERN_TEST_PLATFORM", "cpu")
if _platform == "tpu":
    # "tpu" = the on-device smoke lane (pytest -m tpu): leave the ambient
    # platform in place (the axon tunnel registers as platform "axon",
    # not "tpu" — forcing jax_platforms="tpu" fails to init there)
    _platform = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _platform:
    jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The slow interpret-mode tail (tests/slow_lane.txt: node ids measured
# >= 25 s on this box, frozen from a full-suite timing run) is excluded
# from the default lane by the pyproject addopts marker filter. Coverage
# is NOT lost: `python -m pytest -m slow -q` runs exactly this tail.
# Regenerate the list by running the suite with --durations and
# thresholding; every listed test still collects (a stale entry is a
# no-op, not an error).
_slow_path = os.path.join(os.path.dirname(__file__), "slow_lane.txt")
try:
    with open(_slow_path) as _f:
        _SLOW = {ln.strip() for ln in _f if ln.strip()
                 and not ln.startswith("#")}
except OSError:
    _SLOW = set()


def pytest_collection_modifyitems(items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
