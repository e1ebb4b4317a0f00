"""Flash-attention dispatch: CPU fallback correctness and param compatibility."""
import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpuhar.models.layers import PreNormBlock
from tpuhar.ops.attention import FlashSelfAttention, _reference_attention, flash_mha

KEY = jax.random.PRNGKey(0)


def test_flash_mha_cpu_fallback_matches_reference(rng):
    q = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    # on CPU use_flash=True silently falls back
    out = flash_mha(q, k, v, use_flash=True)
    ref = _reference_attention(q, k, v, 1.0 / np.sqrt(8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_self_attention_params_match_standard(rng):
    """FlashSelfAttention's param tree interchanges with MultiHeadDotProductAttention."""
    D, H = 32, 4
    x = jnp.asarray(rng.normal(size=(2, 10, D)).astype(np.float32))

    std = nn.MultiHeadDotProductAttention(num_heads=H, qkv_features=D)
    std_params = std.init(KEY, x, x)["params"]

    fla = FlashSelfAttention(num_heads=H, qkv_features=D, use_flash=False)
    fla_params = fla.init(KEY, x)["params"]

    std_shapes = jax.tree_util.tree_map(lambda a: a.shape, std_params)
    fla_shapes = jax.tree_util.tree_map(lambda a: a.shape, fla_params)
    assert std_shapes == fla_shapes

    # identical outputs under identical params
    out_std = std.apply({"params": std_params}, x, x, deterministic=True)
    out_fla = fla.apply({"params": std_params}, x)
    np.testing.assert_allclose(
        np.asarray(out_fla), np.asarray(out_std), atol=1e-5
    )


def test_prenorm_block_flash_flag_same_params(rng):
    D, H = 32, 4
    x = jnp.asarray(rng.normal(size=(2, 10, D)).astype(np.float32))
    blk_std = PreNormBlock(d_model=D, num_heads=H, d_ff=D * 4, use_flash=False)
    params = blk_std.init(KEY, x)["params"]
    blk_fla = PreNormBlock(d_model=D, num_heads=H, d_ff=D * 4, use_flash=True)
    # flash block accepts the standard block's params (CPU → fallback math)
    out_std = blk_std.apply({"params": params}, x)
    out_fla = blk_fla.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_fla), np.asarray(out_std), atol=1e-5)
