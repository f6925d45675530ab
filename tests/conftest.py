"""Test configuration.

Tests run JAX on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  Must be set before jax is imported anywhere.
"""

import os

# Force CPU: the axon sitecustomize pins JAX_PLATFORMS=axon (remote TPU
# tunnel) and imports jax at interpreter startup, so the env var alone is
# too late — the config update below is what actually selects CPU.  Tests
# must not take the single tunnel grant.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REF_DATA = pathlib.Path("/root/reference/metagraph/tests/data")


@pytest.fixture(scope="session")
def ref_data():
    if not REF_DATA.exists():
        pytest.skip("reference test data not available")
    return REF_DATA


@pytest.fixture(scope="session")
def transcripts_1000(ref_data):
    from metagraph_tpu.seq_io.fasta import read_fasta
    return [r.seq for r in read_fasta(str(ref_data / "transcripts_1000.fa"))]


@pytest.fixture(scope="session")
def transcripts_100(ref_data):
    from metagraph_tpu.seq_io.fasta import read_fasta
    return [r.seq for r in read_fasta(str(ref_data / "transcripts_100.fa"))]
