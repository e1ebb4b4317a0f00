"""Grain-backed loader option: batch-contract equivalence with BatchLoader."""
import numpy as np
import pytest

pytest.importorskip("grain")

from tpuhar.data.loader import BatchLoader, create_dataloaders
from tpuhar.data.grain_loader import GrainBatchLoader


@pytest.fixture(scope="module")
def manifest(synthetic_config_module):
    from tpuhar.data.preprocess import Preprocessor

    cfg = synthetic_config_module
    df = Preprocessor(cfg).preprocess_split("val", save=True)
    return cfg, df


@pytest.fixture(scope="module")
def synthetic_config_module(tmp_path_factory):
    from tpuhar.data.synthetic import generate_synthetic_dataset, make_synthetic_config

    root = tmp_path_factory.mktemp("grain_ds")
    generate_synthetic_dataset(root, num_classes=3, samples_per_class=2, seed=1)
    cfg = make_synthetic_config(root, tmp_path_factory.mktemp("grain_out"))
    cfg.data.video_frames_per_window = 4
    return cfg


@pytest.mark.parametrize("mode", ["classification", "fusion"])
def test_grain_matches_batchloader_unshuffled(manifest, mode):
    cfg, df = manifest
    ref = list(BatchLoader(df, cfg, mode=mode, batch_size=4, prefetch=0))
    got = list(GrainBatchLoader(df, cfg, mode=mode, batch_size=4))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert int(a["n_valid"]) == int(b["n_valid"])
        np.testing.assert_array_equal(a["imu"], b["imu"])
        np.testing.assert_array_equal(a["idx"], b["idx"])
        if mode == "fusion":
            np.testing.assert_array_equal(a["video"], b["video"])
        if "label" in a:
            np.testing.assert_array_equal(a["label"], b["label"])


def test_grain_shuffle_deterministic_per_epoch(manifest):
    cfg, df = manifest
    loader = GrainBatchLoader(df, cfg, mode="classification", batch_size=4, shuffle=True)

    def epoch_indices(epoch):
        loader.set_epoch(epoch)
        out = []
        for b in loader:
            out.extend(b["idx"][: int(b["n_valid"])].tolist())
        return out

    e0, e1, e0b = epoch_indices(0), epoch_indices(1), epoch_indices(0)
    assert e0 == e0b
    assert e0 != e1
    assert sorted(e0) == list(range(len(df)))  # every row exactly once


def test_grain_multiprocess_workers_match_inprocess(manifest):
    """mp_prefetch path (spawn workers) returns byte-identical batches."""
    cfg, df = manifest
    a = list(GrainBatchLoader(df, cfg, mode="fusion", batch_size=4, workers=0))
    b = list(GrainBatchLoader(df, cfg, mode="fusion", batch_size=4, workers=2))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["imu"], y["imu"])
        np.testing.assert_array_equal(x["video"], y["video"])
        np.testing.assert_array_equal(x["label"], y["label"])


def test_create_dataloaders_grain_backend(manifest):
    cfg, df = manifest
    cfg.data.loader_backend = "grain"
    try:
        loaders = create_dataloaders(cfg, df, df, df, mode="classification")
        assert all(isinstance(l, GrainBatchLoader) for l in loaders.values())
        first = next(iter(loaders["test"]))
        assert first["imu"].shape[0] == cfg.training.train_batch_size
    finally:
        cfg.data.loader_backend = "default"
