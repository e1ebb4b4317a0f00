"""Pallas kernels vs their jnp references (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpuhar.ops.featurize import featurize_windows
from tpuhar.ops.fused_window import featurize_windows_pallas


@pytest.mark.parametrize("B,T", [(4, 250), (3, 128), (1, 250)])
def test_fused_window_matches_jnp(rng, B, T):
    raw = rng.normal(0, 8000, size=(B, T, 6)).astype(np.float32)
    expected = np.asarray(featurize_windows(jnp.asarray(raw)))
    got = np.asarray(featurize_windows_pallas(jnp.asarray(raw), interpret=True))
    assert got.shape == (B, 6, T)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_fused_window_no_medfilt(rng):
    raw = rng.normal(0, 8000, size=(2, 250, 6)).astype(np.float32)
    expected = np.asarray(featurize_windows(jnp.asarray(raw), kernel_size=1))
    got = np.asarray(
        featurize_windows_pallas(jnp.asarray(raw), kernel_size=1, interpret=True)
    )
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_fused_window_no_normalize(rng):
    raw = rng.normal(0, 8000, size=(2, 250, 6)).astype(np.float32)
    expected = np.asarray(featurize_windows(jnp.asarray(raw), normalize=False))
    got = np.asarray(
        featurize_windows_pallas(jnp.asarray(raw), normalize=False, interpret=True)
    )
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_fused_window_custom_scales(rng):
    raw = rng.normal(0, 100, size=(2, 250, 6)).astype(np.float32)
    expected = np.asarray(
        featurize_windows(jnp.asarray(raw), racc=100.0, rgyro=2.0)
    )
    got = np.asarray(
        featurize_windows_pallas(
            jnp.asarray(raw), racc=100.0, rgyro=2.0, interpret=True
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-5)
