#!/usr/bin/env python
"""Find the weakest LEARNABLE coupling strength (CPU sweep, retrieval-gated).

At strength 1.0 the hard fixture's cross-modal pulse (amp ~tint/2 = 4.5-12
gray levels under sigma=45 pixel noise, 4 frames = 0.16 s of a 0.8-1.4 Hz
sine) is unlearnable by EITHER contrastive loss — SigLIP retrieval exactly at
chance after 30 chip epochs, InfoNCE pinned at ln(B)
(docs/BENCHMARKS.md "Article workflow").  This sweep generates small coupled
pools at increasing pulse strength / frames-per-clip and trains a few epochs
per (strength, loss), gating on pair-RETRIEVAL (the loss value lies).  The
weakest setting with retrieval >> chance feeds the chip article run.

CPU: JAX_PLATFORMS=cpu python scripts/probe_coupling_strength.py
Output: markdown table (stderr) + one JSON line -> docs/coupling_strength.json
"""
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    # must run BEFORE any backend query — jax.default_backend() would
    # initialize the axon backend and the platforms update would be a no-op
    # (the 2026-08-21 sweep ran on the chip because of exactly that)
    jax.config.update("jax_platforms", "cpu")

    from tpuhar.data.synthetic import generate_synthetic_dataset, make_synthetic_config
    from tpuhar.cli import Pipeline

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from article_workflow import _pool_retrieval

    root = Path("outputs/coupling_sweep")
    results = []
    for strength in (2.0, 4.0, 8.0):
        for frames in (8,):
            work = root / f"s{strength:g}_f{frames}"
            if work.exists():
                shutil.rmtree(work)
            generate_synthetic_dataset(
                work / "data", num_classes=6, samples_per_class=8,
                seq_len=1500, seed=1000, difficulty="hard", label_noise=0.0,
                cross_modal_coupling=True, coupling_strength=strength,
            )
            for loss in ("siglip", "infonce"):
                out = work / f"out_{loss}"
                cfg = make_synthetic_config(
                    work / "data", out,
                    num_classes=6, video_backbone="tiny_cnn",
                    video_resize=(32, 32), pretrain_epochs=4,
                    pretrain_batch_size=64,
                )
                cfg.data.video_frames_per_window = frames
                cfg.model.compute_dtype = "float32"
                cfg.model.head_norm = "layer"
                cfg.training.use_sigmoid_loss = loss == "siglip"
                cfg.training.pretrain_lr = 2e-4
                cfg.training.seed = 0
                pipe = Pipeline(cfg)
                pipe.run_preprocessing()
                trainer = pipe.run_pretraining()
                ret = _pool_retrieval_at(cfg, out)
                row = {
                    "strength": strength, "frames": frames, "loss": loss,
                    "train_loss": [round(float(x), 3) for x in trainer.history["train"]],
                    "val_loss": [round(float(x), 3) for x in trainer.history["val"]],
                    **ret,
                }
                results.append(row)
                log(f"strength={strength} frames={frames} loss={loss}: "
                    f"top1={ret['retrieval_top1']} (chance {ret['chance']}) "
                    f"top5={ret['retrieval_top5']}")

    log("\n| strength | frames | loss | top1 | top5 | chance |")
    log("|---|---|---|---|---|---|")
    for r in results:
        log(f"| {r['strength']} | {r['frames']} | {r['loss']} | "
            f"{r['retrieval_top1']} | {r['retrieval_top5']} | {r['chance']} |")
    rec = {"bench": "coupling_strength_sweep", "epochs": 4, "results": results}
    Path("docs/coupling_strength.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec))


def _pool_retrieval_at(cfg, out_dir):
    """_pool_retrieval variant taking the output root directly."""
    import article_workflow as aw

    class FakePool:
        def __init__(self, out):
            self._out = Path(out)

        def __truediv__(self, name):
            assert name == "out"
            return self._out

    return aw._pool_retrieval(cfg, FakePool(out_dir))


if __name__ == "__main__":
    main()
