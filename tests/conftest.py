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


@pytest.fixture
def rng():
    return np.random.default_rng(42)
