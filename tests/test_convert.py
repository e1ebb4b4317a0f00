"""Weight conversion: numeric parity with HF VideoMAE; structural parity for resnet18."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tpuhar.models.convert import (
    convert_resnet18_state_dict,
    convert_videomae_state_dict,
    sinusoid_position_table,
)
from tpuhar.models.video import ResNet18, VideoViT

KEY = jax.random.PRNGKey(0)


def test_videomae_numeric_parity():
    """Random HF VideoMAE (tiny) → converted VideoViT gives the same hidden states."""
    from transformers import VideoMAEConfig, VideoMAEModel

    depth, d_model, heads = 2, 192, 3
    hf_cfg = VideoMAEConfig(
        hidden_size=d_model,
        num_hidden_layers=depth,
        num_attention_heads=heads,
        intermediate_size=d_model * 4,
        image_size=32,
        num_frames=4,
        tubelet_size=2,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = VideoMAEModel(hf_cfg).eval()

    B, T, H, W = 2, 4, 32, 32
    n_tokens = (T // 2) * (H // 16) * (W // 16)
    x = np.random.default_rng(0).normal(size=(B, T, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()

    params = convert_videomae_state_dict(
        hf.state_dict(), depth, d_model, heads, n_tokens
    )
    # default HF config uses mean pooling → no final LN in the checkpoint
    vit = VideoViT(
        depth=depth, d_model=d_model, num_heads=heads, pool="mean", use_final_norm=False
    )
    # flax input is (B, T, H, W, C)
    _, tokens = vit.apply({"params": params}, jnp.asarray(x.transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(tokens), hf_out, atol=2e-4, rtol=2e-3)


def test_sinusoid_table_matches_hf():
    from transformers.models.videomae.modeling_videomae import (
        get_sinusoid_encoding_table,
    )

    ours = sinusoid_position_table(16, 64)
    theirs = get_sinusoid_encoding_table(16, 64).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def _fake_resnet18_state_dict(rng):
    """torchvision resnet18 state-dict schema with random values (torchvision not
    installed here; key names/shapes follow its stable public layout)."""
    sd = {}

    def conv(k, cout, cin, ksize):
        sd[k] = torch.from_numpy(
            rng.normal(0, 0.05, size=(cout, cin, ksize, ksize)).astype(np.float32)
        )

    def bn(prefix, c):
        sd[prefix + ".weight"] = torch.ones(c)
        sd[prefix + ".bias"] = torch.zeros(c)
        sd[prefix + ".running_mean"] = torch.zeros(c)
        sd[prefix + ".running_var"] = torch.ones(c)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for li in range(4):
        cin, cout = chans[li], chans[li + 1]
        for bi in range(2):
            c_in = cin if bi == 0 else cout
            conv(f"layer{li + 1}.{bi}.conv1.weight", cout, c_in, 3)
            bn(f"layer{li + 1}.{bi}.bn1", cout)
            conv(f"layer{li + 1}.{bi}.conv2.weight", cout, cout, 3)
            bn(f"layer{li + 1}.{bi}.bn2", cout)
            if bi == 0 and li > 0:
                conv(f"layer{li + 1}.0.downsample.0.weight", cout, cin, 1)
                bn(f"layer{li + 1}.0.downsample.1", cout)
    return sd


def test_resnet18_conversion_structure(rng):
    sd = _fake_resnet18_state_dict(rng)
    params, batch_stats = convert_resnet18_state_dict(sd)

    net = ResNet18()
    x = jnp.zeros((1, 64, 64, 3))
    ref = net.init(KEY, x)

    # converted trees must match the model's own structure leaf-for-leaf
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(
        got_shapes
    )
    assert ref_shapes == got_shapes
    ref_bs = jax.tree_util.tree_map(lambda a: a.shape, ref["batch_stats"])
    got_bs = jax.tree_util.tree_map(lambda a: a.shape, batch_stats)
    assert ref_bs == got_bs

    # and the model runs with them
    out = net.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32)),
    )
    assert out.shape == (1, 512)
    assert np.isfinite(np.asarray(out)).all()


def _fake_mobilenet_v2_state_dict(rng):
    """torchvision mobilenet_v2 state-dict schema with random values."""
    import torch as T

    sd = {}

    def conv(k, cout, cin, ksize):
        sd[k] = T.from_numpy(
            rng.normal(0, 0.05, size=(cout, cin, ksize, ksize)).astype(np.float32)
        )

    def bn(prefix, c):
        sd[prefix + ".weight"] = T.ones(c)
        sd[prefix + ".bias"] = T.zeros(c)
        sd[prefix + ".running_mean"] = T.zeros(c)
        sd[prefix + ".running_var"] = T.ones(c)

    settings = [  # (expand, out, stride) per torchvision inverted-residual
        (1, 16), (6, 24), (6, 24), (6, 32), (6, 32), (6, 32), (6, 64), (6, 64),
        (6, 64), (6, 64), (6, 96), (6, 96), (6, 96), (6, 160), (6, 160), (6, 160),
        (6, 320),
    ]
    conv("features.0.0.weight", 32, 3, 3)
    bn("features.0.1", 32)
    cin = 32
    for i, (expand, cout) in enumerate(settings):
        tp = f"features.{i + 1}.conv"
        hidden = cin * expand
        if expand == 1:
            conv(f"{tp}.0.0.weight", hidden, 1, 3)  # depthwise
            bn(f"{tp}.0.1", hidden)
            conv(f"{tp}.1.weight", cout, hidden, 1)
            bn(f"{tp}.2", cout)
        else:
            conv(f"{tp}.0.0.weight", hidden, cin, 1)
            bn(f"{tp}.0.1", hidden)
            conv(f"{tp}.1.0.weight", hidden, 1, 3)  # depthwise
            bn(f"{tp}.1.1", hidden)
            conv(f"{tp}.2.weight", cout, hidden, 1)
            bn(f"{tp}.3", cout)
        cin = cout
    conv("features.18.0.weight", 1280, 320, 1)
    bn("features.18.1", 1280)
    return sd


def test_mobilenet_v2_conversion_structure(rng):
    from tpuhar.models.convert import convert_mobilenet_v2_state_dict
    from tpuhar.models.video import MobileNetV2

    sd = _fake_mobilenet_v2_state_dict(rng)
    params, batch_stats = convert_mobilenet_v2_state_dict(sd)

    net = MobileNetV2()
    ref = net.init(KEY, jnp.zeros((1, 64, 64, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    ref_bs = jax.tree_util.tree_map(lambda a: a.shape, ref["batch_stats"])
    got_bs = jax.tree_util.tree_map(lambda a: a.shape, batch_stats)
    assert ref_bs == got_bs

    out = net.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32)),
    )
    assert out.shape == (1, 1280)
    assert np.isfinite(np.asarray(out)).all()
