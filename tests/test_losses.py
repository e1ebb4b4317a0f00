"""Loss goldens: jnp implementations vs the reference's torch formulas."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from tpuhar import losses as L


def _norm_pair(rng, b=8, d=256):
    a = rng.normal(size=(b, d)).astype(np.float32)
    v = rng.normal(size=(b, d)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return a, v


def _reference_sigmoid_loss(imu, video, log_t=np.log(10.0), bias=-10.0):
    """The reference's exact formula (src/models/losses.py:25-54), in torch."""
    imu_t, vid_t = torch.from_numpy(imu), torch.from_numpy(video)
    logits = imu_t @ vid_t.T
    logits = logits * float(np.exp(log_t)) + bias
    labels = 2 * torch.eye(imu_t.shape[0]) - 1
    return TF.binary_cross_entropy_with_logits(
        logits * labels, (labels + 1) / 2, reduction="mean"
    ).item()


def test_siglip_quirk_mode_matches_reference_formula(rng):
    imu, video = _norm_pair(rng)
    ours = float(
        L.siglip_loss(
            jnp.asarray(imu), jnp.asarray(video), jnp.log(10.0), -10.0,
            quirk_sign_flip=True,
        )
    )
    theirs = _reference_sigmoid_loss(imu, video)
    assert abs(ours - theirs) < 1e-5


def test_siglip_correct_mode_repels_negatives():
    """In correct SigLIP, raising ONLY an off-diagonal similarity raises the loss;
    the quirk mode (every pair attractive) lowers it.  Deterministic construction:
    orthonormal embeddings so exactly one pairwise similarity changes."""
    b, d = 4, 16
    video = np.eye(d, dtype=np.float32)[:b]  # orthonormal
    imu = video.copy()  # perfectly aligned positives, zero negatives

    # raise sim(imu[0], video[1]) from 0 to ~0.6 while keeping sim(0,0) high
    imu2 = imu.copy()
    imu2[0] = 0.8 * video[0] + 0.6 * video[1]  # unit norm by construction

    base = float(L.siglip_loss(jnp.asarray(imu), jnp.asarray(video), 0.0, 0.0))
    moved = float(L.siglip_loss(jnp.asarray(imu2), jnp.asarray(video), 0.0, 0.0))
    # the (0,1) negative got more similar and the (0,0) positive got less similar
    # by less than that → correct SigLIP must penalize
    assert moved > base

    base_q = float(
        L.siglip_loss(jnp.asarray(imu), jnp.asarray(video), 0.0, 0.0, quirk_sign_flip=True)
    )
    moved_q = float(
        L.siglip_loss(jnp.asarray(imu2), jnp.asarray(video), 0.0, 0.0, quirk_sign_flip=True)
    )
    # quirk mode attracts every pair: higher off-diagonal similarity lowers its loss
    # (net of the small positive-pair drop: softplus slope at 0 < slope at -0.8)
    assert moved_q < base_q


def test_siglip_perfect_alignment_low_loss(rng):
    imu, _ = _norm_pair(rng, b=8, d=64)
    # identical embeddings, high temperature, bias ~ 0 → near-zero positive loss
    loss = float(
        L.siglip_loss(jnp.asarray(imu), jnp.asarray(imu), jnp.log(20.0), -10.0)
    )
    # positives: sim=1 → logit=10 → ~0; negatives: sim<1 pushed below bias
    assert loss < 0.7


def test_infonce_matches_torch(rng):
    imu, video = _norm_pair(rng)
    ours = float(L.infonce_loss(jnp.asarray(imu), jnp.asarray(video), 0.07))
    imu_t, vid_t = torch.from_numpy(imu), torch.from_numpy(video)
    logits = imu_t @ vid_t.T / 0.07
    labels = torch.arange(8)
    theirs = (
        (TF.cross_entropy(logits, labels) + TF.cross_entropy(logits.T, labels)) / 2
    ).item()
    assert abs(ours - theirs) < 1e-5


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(8, 32)).astype(np.float32)
    labels = rng.integers(0, 32, size=8)
    ours = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    assert abs(ours - theirs) < 1e-5


def test_focal_matches_torch_formula(rng):
    logits = rng.normal(size=(8, 32)).astype(np.float32)
    labels = rng.integers(0, 32, size=8)
    ours = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0))
    ce = TF.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction="none"
    )
    pt = torch.exp(-ce)
    theirs = ((1 - pt) ** 2 * ce).mean().item()
    assert abs(ours - theirs) < 1e-5


def test_label_smoothing_matches_torch_formula(rng):
    logits = rng.normal(size=(8, 32)).astype(np.float32)
    labels = rng.integers(0, 32, size=8)
    ours = float(
        L.label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), epsilon=0.1)
    )
    logp = TF.log_softmax(torch.from_numpy(logits), dim=1)
    oh = torch.zeros_like(logp).scatter_(1, torch.from_numpy(labels)[:, None], 1)
    oh = oh * 0.9 + 0.1 / 32
    theirs = (-(oh * logp).sum(1)).mean().item()
    assert abs(ours - theirs) < 1e-5


def test_weighted_ce_reduces_to_ce_with_uniform_weights(rng):
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=8)
    w = jnp.ones(4)
    a = float(L.weighted_cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), w))
    b = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(a - b) < 1e-6


def test_factory():
    assert L.get_loss_function("infonce") is L.infonce_loss
    fn = L.get_loss_function("focal", gamma=1.5)
    assert callable(fn)
    with pytest.raises(ValueError):
        L.get_loss_function("nope")


def test_siglip_loss_masks_padded_rows():
    """n_valid masking == computing the loss on the cropped batch (ADVICE r1: padded
    rows must not enter the pair matrix as fake zero-embedding positives)."""
    import numpy as np

    from tpuhar.losses import siglip_loss

    rng = np.random.default_rng(0)
    e = rng.normal(size=(6, 8)).astype(np.float32)
    f = rng.normal(size=(6, 8)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    pad = ((0, 2), (0, 0))
    full = siglip_loss(np.pad(e, pad), np.pad(f, pad), 2.3, -10.0, n_valid=6)
    crop = siglip_loss(e, f, 2.3, -10.0)
    assert abs(float(full) - float(crop)) < 1e-6
    biased = siglip_loss(np.pad(e, pad), np.pad(f, pad), 2.3, -10.0)
    assert abs(float(biased) - float(crop)) > 1e-6


def test_infonce_loss_masks_padded_rows():
    import numpy as np

    from tpuhar.losses import infonce_loss

    rng = np.random.default_rng(1)
    e = rng.normal(size=(5, 8)).astype(np.float32)
    f = rng.normal(size=(5, 8)).astype(np.float32)
    pad = ((0, 3), (0, 0))
    full = infonce_loss(np.pad(e, pad), np.pad(f, pad), 0.1, n_valid=5)
    crop = infonce_loss(e, f, 0.1)
    assert abs(float(full) - float(crop)) < 1e-5
