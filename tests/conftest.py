"""Test configuration: force CPU JAX with an 8-device virtual mesh so
sharding logic is exercised without TPU hardware, and provide the
reference-oracle binary fixture."""

import os
import subprocess
from pathlib import Path

# Must happen before any jax import anywhere in the test session.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config key
# is honored.  Must run before any computation.
#
# GNUAIS_TEST_TPU=1 selects the on-silicon tier (`pytest -m tpu`): the
# real TPU stays the default backend and the kernels run compiled, NOT
# interpreted; CPU devices remain available for exact-chain references.
if not os.environ.get("GNUAIS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import pytest

REPO = Path(__file__).resolve().parent.parent
ORACLE_BIN = REPO / ".oracle" / "build" / "gnuais_oracle"
REFERENCE_DIR = Path(os.environ.get("REFERENCE_DIR", "/root/reference"))


@pytest.fixture(scope="session")
def oracle_bin():
    """Path to the reference gnuais binary; builds it on first use.
    Skips oracle-parity tests when the reference tree is unavailable."""
    if not ORACLE_BIN.exists():
        if not REFERENCE_DIR.exists():
            pytest.skip("reference tree not available for oracle build")
        subprocess.run(
            ["bash", str(REPO / "tools" / "build_oracle.sh")],
            check=True, capture_output=True,
        )
    return ORACLE_BIN
