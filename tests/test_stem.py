"""Patch-major stem lowering (ops/stem.py) — exactness and end-to-end parity.

The serving engines ship clips in patch-major layout ``(B, T, H/p, W/p, p²·3)``
so the patch-embed stem lowers to one full-K GEMM (measured 3.45 vs 11.06 ms
@4096 frames on v5e — ops/stem.py docstring table).  These tests pin:

- the host/device layout shuffles agree and round-trip,
- the XLA GEMM stem reproduces ``ops/quant.int8_conv``'s stem exactly,
- the Pallas variant (interpret mode) matches too,
- the quantized tpu_cnn forwards produce identical features for NHWC and
  patch-major inputs,
- ``TPUVideoCNN`` / the serving ``InferenceEngine`` give identical outputs
  through both layouts (bf16/f32 and int8 engines).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuhar.ops import quant as Q
from tpuhar.ops.stem import (
    pack_stem_weights,
    stem_gemm_u8,
    stem_gemm_u8_pallas,
    to_patch_major,
    to_patch_major_jnp,
)


@pytest.fixture(scope="module")
def stem_fixture():
    npr = np.random.default_rng(0)
    p, c0 = 16, 32
    u8 = (npr.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    u8[0, :16, :16] = 0  # exercise the u8=0 clip corner
    kernel = npr.normal(0, 0.05, (p, p, 3, c0)).astype(np.float32)
    w_q, w_s = Q.quantize_weights(jnp.asarray(kernel), axis=-1)
    bias = npr.normal(0, 0.1, (c0,)).astype(np.float32)
    x_q = jnp.clip(jnp.asarray(u8).astype(jnp.int16) - 128, -127, 127).astype(
        jnp.int8
    )
    y_conv = np.asarray(
        jax.nn.relu(
            Q.int8_conv(
                x_q, w_q, jnp.float32(1.0), w_s, strides=(p, p), padding="VALID"
            )
            + bias
        )
    )
    return dict(
        u8=u8, p=p, c0=c0, kernel=kernel, w_q=np.asarray(w_q),
        w_scale=np.asarray(w_s).reshape(-1), bias=bias, y_conv=y_conv,
    )


def test_to_patch_major_host_device_agree(stem_fixture):
    f = stem_fixture
    col_h = to_patch_major(f["u8"], f["p"])
    col_d = np.asarray(to_patch_major_jnp(jnp.asarray(f["u8"]), f["p"]))
    assert col_h.shape == (3, 4, 4, f["p"] * f["p"] * 3)
    np.testing.assert_array_equal(col_h, col_d)
    # leading batch/time dims pass through
    clip = f["u8"].reshape(1, 3, 64, 64, 3)
    np.testing.assert_array_equal(
        to_patch_major(clip, f["p"])[0], col_h
    )


def test_stem_gemm_matches_int8_conv(stem_fixture):
    f = stem_fixture
    col = jnp.asarray(to_patch_major(f["u8"], f["p"]))
    wp = jnp.asarray(pack_stem_weights(f["w_q"]))
    for mxu in (jnp.int8, jnp.float32):
        y = np.asarray(
            stem_gemm_u8(
                col, wp, jnp.asarray(f["w_scale"]), jnp.asarray(f["bias"]),
                sub=128, clip_lo=-127, mxu_dtype=mxu,
            )
        )
        np.testing.assert_allclose(
            y.reshape(f["y_conv"].shape), f["y_conv"], atol=1e-4
        )


def test_stem_gemm_byte_map_exhaustive():
    """Every uint8 value through the fused int8-GEMM input map, vs the exact
    integer reference clip(u8−128, −127, 127).

    Pins the uint8-space formulation (max then xor then bitcast) in
    ``stem_gemm_u8``: the naive int8-space chain (bitcast, ^−128, max −127)
    MISCOMPILES when fused with the consuming dot_general on TPU (jax 0.9.0,
    v5e — wrong results for half the byte range; bisect ladder in
    scripts/debug_pm_micro{,2,3}.py, caught live as id-acc 98.6→23.3 in
    validate_int8_ood).  CPU lowers both correctly, so this test pins the
    semantics; scripts/debug_pm_tpu.py is the on-chip check.
    """
    K = 256
    col = np.arange(256, dtype=np.uint8).reshape(1, 1, 1, K)
    w = np.eye(K, dtype=np.int8)  # identity weight → output IS the mapped input
    y = np.asarray(
        stem_gemm_u8(
            jnp.asarray(col), jnp.asarray(w),
            jnp.ones((K,), np.float32), jnp.zeros((K,), np.float32),
            sub=128, clip_lo=-127, relu=False, mxu_dtype=jnp.int8,
        )
    ).reshape(K)
    ref = np.clip(np.arange(256, dtype=np.int32) - 128, -127, 127)
    np.testing.assert_array_equal(y.astype(np.int32), ref)


def test_verify_byte_map_preflight():
    """The deployable preflight passes on a correct backend and raises with a
    diagnostic when the mapped values are wrong (simulated via a patched map)."""
    from tpuhar.ops import stem as stem_mod

    stem_mod.verify_byte_map()  # CPU lowers the map correctly

    orig = stem_mod.stem_gemm_u8

    def broken(col, w, scale, bias, **kw):
        # simulate the TPU miscompile: sign-flip half the byte range
        y = orig(col, w, scale, bias, **kw)
        return -y

    stem_mod.stem_gemm_u8 = broken
    try:
        with pytest.raises(RuntimeError, match="MISCOMPILES"):
            stem_mod.verify_byte_map()
    finally:
        stem_mod.stem_gemm_u8 = orig


def test_centered_wire_encoding_exact(stem_fixture):
    """to_patch_major(centered=True) ships clip(u8−128,−127,·) int8; the GEMM
    consumes it directly and reproduces the uint8 path exactly (both MXU modes)."""
    f = stem_fixture
    wp = jnp.asarray(pack_stem_weights(f["w_q"]))
    ws, b = jnp.asarray(f["w_scale"]), jnp.asarray(f["bias"])
    col_u8 = jnp.asarray(to_patch_major(f["u8"], f["p"]))
    col_c = to_patch_major(f["u8"], f["p"], centered=True)
    assert col_c.dtype == np.int8
    y_u = np.asarray(stem_gemm_u8(col_u8, wp, ws, b))
    for mxu in (jnp.int8, jnp.float32):
        y_c = np.asarray(
            stem_gemm_u8(
                jnp.asarray(col_c), wp if mxu == jnp.int8 else wp.astype(mxu),
                ws, b, mxu_dtype=mxu,
            )
        )
        np.testing.assert_array_equal(y_c, y_u)


def test_quant_forward_accepts_centered_wire():
    q, _, _ = _quant_tree()
    npr = np.random.default_rng(5)
    frames = (npr.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    y_u = np.asarray(
        Q.quant_tpucnn_forward_resident(
            q, jnp.asarray(to_patch_major(frames, q["patch"]))
        )
    )
    y_c = np.asarray(
        Q.quant_tpucnn_forward_resident(
            q, jnp.asarray(to_patch_major(frames, q["patch"], centered=True))
        )
    )
    np.testing.assert_array_equal(y_c, y_u)


def test_stem_gemm_int8_output_quantize(stem_fixture):
    f = stem_fixture
    col = jnp.asarray(to_patch_major(f["u8"], f["p"]))
    wp = jnp.asarray(pack_stem_weights(f["w_q"]))
    site = 0.07
    yq = np.asarray(
        stem_gemm_u8(
            col, wp, jnp.asarray(f["w_scale"]), jnp.asarray(f["bias"]),
            sub=128, clip_lo=-127, out_scale=site, out_dtype=jnp.int8,
        )
    )
    yq_ref = np.asarray(
        Q.quantize_activations(jnp.asarray(f["y_conv"]), jnp.float32(site))
    )
    np.testing.assert_array_equal(yq.reshape(yq_ref.shape), yq_ref)


def test_stem_gemm_pallas_interpret(stem_fixture):
    f = stem_fixture
    col = jnp.asarray(to_patch_major(f["u8"], f["p"]))
    wp = jnp.asarray(pack_stem_weights(f["w_q"]))
    y = np.asarray(
        stem_gemm_u8_pallas(
            col, wp, jnp.asarray(f["w_scale"]), jnp.asarray(f["bias"]),
            mxu_dtype=jnp.int8, interpret=True,
        )
    )
    # the clip_lo map now runs in uint8 space outside the kernel, so the
    # Pallas variant matches int8_conv exactly — including u8==0 pixels
    # (the fixture pins a block of them)
    ref = f["y_conv"].reshape(y.shape)
    np.testing.assert_allclose(y, ref, atol=1e-4)


def _quant_tree(kernel_free=False):
    from tpuhar.models.video import TPUVideoCNN
    from tpuhar.ops.video import IMAGENET_MEAN, IMAGENET_STD

    npr = np.random.default_rng(1)
    net = TPUVideoCNN(dtype=jnp.float32)
    variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    calib = npr.normal(0, 1, size=(4, 64, 64, 3)).astype(np.float32)
    stats = Q.calibrate_tpucnn(variables["params"], variables["batch_stats"], calib)
    q = jax.device_get(
        Q.quantize_tpucnn(
            variables["params"], variables["batch_stats"], stats,
            input_fold=(IMAGENET_MEAN, IMAGENET_STD),
        )
    )
    return q, variables, net


@pytest.mark.parametrize("resident", [False, True])
def test_quant_tpucnn_patch_major_matches_nhwc(resident):
    q, _, _ = _quant_tree()
    npr = np.random.default_rng(2)
    frames = (npr.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    frames[0, :16, :16] = 0
    fwd = Q.quant_tpucnn_forward_resident if resident else Q.quant_tpucnn_forward
    y_nhwc = np.asarray(fwd(q, jnp.asarray(frames)))
    y_pm = np.asarray(fwd(q, jnp.asarray(to_patch_major(frames, q["patch"]))))
    np.testing.assert_allclose(y_pm, y_nhwc, rtol=1e-5, atol=1e-4)


def test_tpucnn_model_patch_major_matches_nhwc():
    from tpuhar.models.video import TPUVideoCNN

    npr = np.random.default_rng(3)
    net = TPUVideoCNN(dtype=jnp.float32)
    variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    frames = (npr.random((2, 64, 64, 3)) * 255).astype(np.float32)  # raw 0..255
    col = np.asarray(
        to_patch_major(frames.astype(np.uint8), 16), np.float32
    )
    y_nhwc = np.asarray(
        net.apply(variables, jnp.asarray(frames.astype(np.uint8), jnp.float32),
                  train=False)
    )
    y_pm = np.asarray(net.apply(variables, jnp.asarray(col), train=False))
    np.testing.assert_allclose(y_pm, y_nhwc, rtol=2e-5, atol=1e-4)


def _engine_fixture(quantize: bool):
    from tpuhar.config import Config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.serving import InferenceEngine

    cfg = Config()
    cfg.model.num_classes = 4
    cfg.model.imu_num_layers = 1
    cfg.model.imu_d_model = 32
    cfg.model.imu_nhead = 4
    cfg.model.fusion_heads = 4
    cfg.model.classifier_hidden_dims = [16]
    cfg.model.head_norm = "layer"
    cfg.model.video_d_model = 32
    cfg.model.video_backbone = "tpu_cnn"
    cfg.model.compute_dtype = "float32"
    cfg.model.video_pretrained = False
    cfg.data.video_resize = (32, 32)
    cfg.data.video_frames_per_window = 2
    d = cfg.data
    model = FusionClassifier(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, d.imu_channels, d.imu_window_size), np.float32),
        np.zeros((1, 2, 32, 32, 3), np.float32),
    )
    npr = np.random.default_rng(4)
    imu = npr.normal(0, 8000, (3, d.imu_window_size, d.imu_channels)).astype(
        np.float32
    )
    video = (npr.random((3, 2, 32, 32, 3)) * 255).astype(np.uint8)
    kw = {}
    if quantize:
        kw["quantize_calib_clips"] = (
            npr.random((2, 2, 32, 32, 3)) * 255
        ).astype(np.uint8)
    engine = InferenceEngine(cfg, variables, batch_sizes=[4], **kw)
    return engine, imu, video


@pytest.mark.parametrize("quantize", [False, True])
def test_engine_patch_major_transparent(quantize):
    """The engine converts NHWC → patch-major internally; callers see one API."""
    engine, imu, video = _engine_fixture(quantize)
    assert engine.patch_major, "tpu_cnn serving engines use the patch-major layout"
    out = engine.predict(imu, video)
    assert out["logits"].shape[0] == 3
    assert np.isfinite(out["logits"]).all()
    # pre-converted input gives the identical program result
    pre = to_patch_major(video, 16)
    out2 = engine.predict(imu, pre)
    np.testing.assert_allclose(out2["logits"], out["logits"], atol=1e-5)
    # the stream path shares the conversion
    (sout,) = list(engine.predict_stream(iter([(imu, video)])))
    np.testing.assert_allclose(sout["logits"], out["logits"], atol=1e-5)
