"""Pallas fused 3×3 conv (ops/conv3x3.py): numerics vs the XLA expression, the
fallback path, and XLA↔Pallas equivalence of the full TPUVideoCNN eval forward.

Runs the kernel through the Pallas interpreter on CPU (the same code path TPU
compiles); tolerances are f32-tight because both sides accumulate in f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuhar.ops.conv3x3 import _xla_reference, conv3x3_bn_act, fold_bn


def _case(n, s, cin, cout, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, s, s, cin), dtype)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dtype)
    scale = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    return x, k, scale, bias


@pytest.mark.parametrize("im2col", [False, True])
@pytest.mark.parametrize("s,n", [(14, 4), (7, 16), (14, 8)])
def test_matches_xla(s, n, im2col):
    x, k, scale, bias = _case(n, s, 128, 128)
    got = conv3x3_bn_act(x, k, scale, bias, force_pallas=True, im2col=im2col)
    want = _xla_reference(x, k, scale, bias, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_residual_no_relu():
    x, k, scale, bias = _case(4, 14, 128, 128, seed=1)
    res = jnp.asarray(np.random.RandomState(2).randn(4, 14, 14, 128), jnp.float32)
    got = conv3x3_bn_act(x, k, scale, bias, residual=res, relu=False, force_pallas=True)
    want = _xla_reference(x, k, scale, bias, res, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    # and with relu
    got = conv3x3_bn_act(x, k, scale, bias, residual=res, relu=True, force_pallas=True)
    want = _xla_reference(x, k, scale, bias, res, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_wide_channels():
    # 256→512-style shape (scaled down in N to keep CPU time sane)
    x, k, scale, bias = _case(16, 7, 256, 256, seed=3)
    got = conv3x3_bn_act(x, k, scale, bias, force_pallas=True)
    want = _xla_reference(x, k, scale, bias, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_frame_boundaries_are_exact():
    """Each frame's conv must not leak into its neighbours: compare against
    frame-at-a-time XLA conv."""
    x, k, scale, bias = _case(16, 7, 128, 128, seed=4)
    got = conv3x3_bn_act(x, k, scale, bias, force_pallas=True)
    per_frame = jnp.concatenate(
        [_xla_reference(x[i : i + 1], k, scale, bias, None, True) for i in range(16)],
        axis=0,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(per_frame), atol=1e-4, rtol=1e-4
    )


def test_fallback_small_shapes():
    # C=64 is off the 128-lane grid → must fall back to XLA, same semantics.
    x, k, scale, bias = _case(2, 6, 64, 64, seed=5)
    got = conv3x3_bn_act(x, k, scale, bias)
    want = _xla_reference(x, k, scale, bias, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    with pytest.raises(ValueError):
        conv3x3_bn_act(x, k, scale, bias, force_pallas=True)


def test_fold_bn():
    scale, bias, mean, var = (
        jnp.asarray([2.0]), jnp.asarray([1.0]), jnp.asarray([0.5]), jnp.asarray([4.0])
    )
    s, b = fold_bn(scale, bias, mean, var, eps=0.0)
    np.testing.assert_allclose(np.asarray(s), [1.0])
    np.testing.assert_allclose(np.asarray(b), [0.5])


def test_tpucnn_backend_equivalence():
    """TPUVideoCNN eval forward: conv_backend='pallas' must match 'xla' with the SAME
    variables (param-tree interchangeability + numerics)."""
    from tpuhar.models.video import TPUVideoCNN

    frames = jnp.asarray(
        np.random.RandomState(0).randn(16, 224, 224, 3), jnp.float32
    )
    xla_net = TPUVideoCNN(dtype=jnp.float32)
    pallas_net = TPUVideoCNN(conv_backend="pallas", dtype=jnp.float32)
    variables = xla_net.init(jax.random.PRNGKey(0), frames[:1, :32, :32], train=False)
    # batch_stats at init are mean=0/var=1; perturb them so folding is exercised.
    perturbed = jax.tree.map(
        lambda v: v + 0.25 * np.random.RandomState(1).rand(*v.shape).astype(v.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": perturbed}

    want = xla_net.apply(variables, frames, train=False)
    got = pallas_net.apply(variables, frames, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3)
