"""Int8 quantization: primitive correctness and end-to-end resnet18 drift."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.models.video import ResNet18
from tpuhar.ops.quant import (
    calibrate_resnet18,
    fold_bn,
    int8_conv,
    int8_dense,
    quant_resnet18_forward,
    quantize_resnet18,
    quantize_weights,
)

KEY = jax.random.PRNGKey(0)


def test_quantize_weights_roundtrip(rng):
    w = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    w_q, scale = quantize_weights(jnp.asarray(w))
    w_hat = np.asarray(w_q, np.float32) * np.asarray(scale)
    # quantization error bounded by half a step per channel
    step = np.asarray(scale).reshape(-1)
    err = np.abs(w_hat - w).max(axis=(0, 1, 2))
    assert (err <= step * 0.5 + 1e-7).all()


def test_int8_dense_matches_f32(rng):
    x = rng.normal(size=(8, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    w_q, w_s = quantize_weights(jnp.asarray(w), axis=-1)
    xs = jnp.float32(np.abs(x).max() / 127.0)
    from tpuhar.ops.quant import quantize_activations

    x_q = quantize_activations(jnp.asarray(x), xs)
    got = np.asarray(int8_dense(x_q, w_q, xs, w_s))
    want = x @ w
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.03


def test_int8_conv_matches_f32(rng):
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    w_q, w_s = quantize_weights(jnp.asarray(w), axis=-1)
    xs = jnp.float32(np.abs(x).max() / 127.0)
    from tpuhar.ops.quant import quantize_activations

    x_q = quantize_activations(jnp.asarray(x), xs)
    got = np.asarray(int8_conv(x_q, w_q, xs, w_s.reshape(-1)))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn
        )
    )
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.03


def test_fold_bn_exact(rng):
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bias = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    conv = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn
    )
    bn = (conv - mean) / np.sqrt(var + 1e-5) * scale + bias

    k2, b2 = fold_bn(jnp.asarray(w), scale, bias, mean, var)
    folded = (
        jax.lax.conv_general_dilated(
            jnp.asarray(x), k2, (1, 1), "SAME", dimension_numbers=dn
        )
        + b2
    )
    np.testing.assert_allclose(np.asarray(folded), np.asarray(bn), atol=1e-4)


def test_quantized_resnet18_small_drift(rng):
    """Calibrate + quantize a random resnet18; int8 features stay close to f32."""
    net = ResNet18()
    frames = rng.normal(0, 1.0, size=(4, 64, 64, 3)).astype(np.float32)
    variables = net.init(KEY, jnp.asarray(frames))
    params, bs = variables["params"], variables["batch_stats"]

    f32_out = np.asarray(net.apply(variables, jnp.asarray(frames), train=False))

    stats = calibrate_resnet18(params, bs, frames)
    assert "stem" in stats and "layer3_1.mid" in stats
    q = quantize_resnet18(params, bs, stats)
    q_out = np.asarray(quant_resnet18_forward(q, jnp.asarray(frames)))

    assert q_out.shape == f32_out.shape
    denom = np.abs(f32_out).mean() + 1e-8
    rel = np.abs(q_out - f32_out).mean() / denom
    assert rel < 0.15, f"quantization drift {rel:.3f}"
    # rankings should broadly agree
    corr = np.corrcoef(q_out.ravel(), f32_out.ravel())[0, 1]
    assert corr > 0.98


def test_quantized_tpucnn_small_drift(rng):
    """Calibrate + quantize a random TPUVideoCNN; int8 features track f32."""
    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops.quant import (
        calibrate_tpucnn,
        quant_tpucnn_forward,
        quantize_tpucnn,
    )

    net = TPUVideoCNN(widths=(32, 64), patch=8)
    frames = rng.normal(0, 1.0, size=(4, 64, 64, 3)).astype(np.float32)
    variables = net.init(KEY, jnp.asarray(frames), train=False)
    params, bs = variables["params"], variables["batch_stats"]

    f32_out = np.asarray(net.apply(variables, jnp.asarray(frames), train=False))

    stats = calibrate_tpucnn(params, bs, frames)
    assert "stem" in stats and "s1b0.mid" in stats and "down1.in" in stats
    q = quantize_tpucnn(params, bs, stats)
    q_out = np.asarray(quant_tpucnn_forward(q, jnp.asarray(frames)))

    assert q_out.shape == f32_out.shape
    denom = np.abs(f32_out).mean() + 1e-8
    rel = np.abs(q_out - f32_out).mean() / denom
    assert rel < 0.15, f"quantization drift {rel:.3f}"
    corr = np.corrcoef(q_out.ravel(), f32_out.ravel())[0, 1]
    assert corr > 0.98


def test_tpucnn_input_fold_matches_normalized(rng):
    """input_fold (raw u8 → stem) ≈ normalize_clip + calibrated-quantize path."""
    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops.quant import (
        calibrate_tpucnn,
        quant_tpucnn_forward,
        quantize_tpucnn,
    )
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD, normalize_clip

    net = TPUVideoCNN(widths=(32, 64), patch=8)
    u8 = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    normalized = np.asarray(normalize_clip(jnp.asarray(u8)[None])[0])
    variables = net.init(KEY, jnp.asarray(normalized), train=False)
    params, bs = variables["params"], variables["batch_stats"]

    stats = calibrate_tpucnn(params, bs, normalized)
    q_plain = quantize_tpucnn(params, bs, stats)
    q_fold = quantize_tpucnn(
        params, bs, stats, input_fold=(IMAGENET_MEAN, IMAGENET_STD)
    )
    out_plain = np.asarray(quant_tpucnn_forward(q_plain, jnp.asarray(normalized)))
    out_fold = np.asarray(quant_tpucnn_forward(q_fold, jnp.asarray(u8)))

    denom = np.abs(out_plain).mean() + 1e-8
    rel = np.abs(out_fold - out_plain).mean() / denom
    assert rel < 0.1, f"input-fold drift {rel:.3f}"
    corr = np.corrcoef(out_fold.ravel(), out_plain.ravel())[0, 1]
    assert corr > 0.99


def test_tpucnn_resident_matches_baseline(rng):
    """int8-resident forward ≈ baseline int8 forward (same tree, residual deq only).

    The two paths share every conv input through the first residual block; the only
    numeric divergence is the skip add reading deq(x_q).  On a random net the
    feature agreement must be near-exact (far tighter than the int8-vs-f32 bound).
    Covers both the calibrated-input and the uint8 input-fold builds, and a
    2-blocks-per-stage layout (mid-block producer-side requantization).
    """
    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops.quant import (
        calibrate_tpucnn,
        quant_tpucnn_forward,
        quant_tpucnn_forward_resident,
        quantize_tpucnn,
    )
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD, normalize_clip

    for blocks in (1, 2):
        net = TPUVideoCNN(widths=(32, 64), patch=8, blocks_per_stage=blocks)
        u8 = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
        normalized = np.asarray(normalize_clip(jnp.asarray(u8)[None])[0])
        variables = net.init(KEY, jnp.asarray(normalized), train=False)
        params, bs = variables["params"], variables["batch_stats"]

        stats = calibrate_tpucnn(params, bs, normalized)
        for q, x in (
            (quantize_tpucnn(params, bs, stats), normalized),
            (
                quantize_tpucnn(
                    params, bs, stats, input_fold=(IMAGENET_MEAN, IMAGENET_STD)
                ),
                u8,
            ),
        ):
            base = np.asarray(quant_tpucnn_forward(q, jnp.asarray(x)))
            res = np.asarray(quant_tpucnn_forward_resident(q, jnp.asarray(x)))
            assert res.shape == base.shape
            denom = np.abs(base).mean() + 1e-8
            rel = np.abs(res - base).mean() / denom
            assert rel < 0.02, f"resident drift {rel:.4f} (blocks={blocks})"
            corr = np.corrcoef(res.ravel(), base.ravel())[0, 1]
            assert corr > 0.999


def test_resnet18_resident_matches_baseline(rng):
    """int8-resident ResNet-18 ≈ baseline int8 forward (identity-skip deq only;
    downsample-branch codes and int8 max-pool are bit-identical by construction)."""
    from tpuhar.ops.quant import (
        calibrate_resnet18,
        quant_resnet18_forward,
        quant_resnet18_forward_resident,
        quantize_resnet18,
    )

    net = ResNet18()
    frames = rng.normal(0, 1.0, size=(2, 64, 64, 3)).astype(np.float32)
    variables = net.init(KEY, jnp.asarray(frames), train=False)
    params, bs = variables["params"], variables["batch_stats"]

    stats = calibrate_resnet18(params, bs, frames)
    q = quantize_resnet18(params, bs, stats)
    base = np.asarray(quant_resnet18_forward(q, jnp.asarray(frames)))
    res = np.asarray(quant_resnet18_forward_resident(q, jnp.asarray(frames)))

    assert res.shape == base.shape
    denom = np.abs(base).mean() + 1e-8
    rel = np.abs(res - base).mean() / denom
    assert rel < 0.02, f"resident drift {rel:.4f}"
    corr = np.corrcoef(res.ravel(), base.ravel())[0, 1]
    assert corr > 0.999


def test_device_put_qtree_metadata_stays_static(rng):
    """A fully ``jax.device_put``'d quantized tree must still drive the jitted
    forwards: device_put turns the tree's Python-int metadata (patch, layout)
    into 0-d arrays, and any staged op on those under jit yields a tracer
    (regression: TracerBoolConversionError in _is_patch_major, caught live by
    scripts/perf_stem_gemm3.py)."""
    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops.quant import (
        calibrate_tpucnn,
        quant_tpucnn_forward,
        quant_tpucnn_forward_resident,
        quantize_tpucnn,
    )
    from tpuhar.ops.stem import to_patch_major
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD, normalize_clip

    net = TPUVideoCNN(widths=(32, 64), patch=8, blocks_per_stage=1)
    u8 = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    normalized = np.asarray(normalize_clip(jnp.asarray(u8)[None])[0])
    variables = net.init(KEY, jnp.asarray(normalized), train=False)
    params, bs = variables["params"], variables["batch_stats"]
    stats = calibrate_tpucnn(params, bs, normalized)
    q = quantize_tpucnn(
        params, bs, stats, input_fold=(IMAGENET_MEAN, IMAGENET_STD)
    )
    q_dev = jax.device_put(q)
    pm = to_patch_major(u8, patch=8)

    for fwd in (quant_tpucnn_forward, quant_tpucnn_forward_resident):
        for x in (u8, pm):
            ref = np.asarray(jax.jit(lambda a: fwd(q, a))(jnp.asarray(x)))
            got = np.asarray(jax.jit(lambda a: fwd(q_dev, a))(jnp.asarray(x)))
            np.testing.assert_array_equal(got, ref)
