"""Test harness config: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``), per SURVEY.md §4's test plan; the real-TPU
path is exercised by bench.py and the driver's compile checks instead.
"""
import os

# Must be set before jax is imported anywhere. Force CPU even if the shell exports
# JAX_PLATFORMS=axon — unit tests must not compile over the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-updates jax_platforms to "axon,cpu" at interpreter
# startup, which wins over the env var — override it back before any backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """Session-scoped tiny dataset in the raw UESTC-MMEA-CL layout."""
    from tpuhar.data.synthetic import generate_synthetic_dataset

    root = tmp_path_factory.mktemp("synth_data")
    generate_synthetic_dataset(root, num_classes=4, samples_per_class=3, seed=0)
    return root


@pytest.fixture()
def synthetic_config(synthetic_dataset, tmp_path):
    from tpuhar.data.synthetic import make_synthetic_config

    return make_synthetic_config(synthetic_dataset, tmp_path / "outputs")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
