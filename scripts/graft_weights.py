#!/usr/bin/env python
"""One-command pretrained-weight graft: torch/HF checkpoint → tpuhar model tree.

The reference downloads its video backbone at model construction
(/root/reference/src/models/models.py:154-173); this container has no network,
so the moment a real checkpoint file IS reachable, this is the single command
that ingests it (VERDICT r3 #8):

    python scripts/graft_weights.py CKPT.{pt,pth,bin,npz} \
        --backbone videomae_base --out outputs/grafted_params.msgpack \
        [--set data.video_resize=(224,224)] [--imu-only-head]

It loads the state dict (torch or npz; DataParallel/Lightning envelopes are
normalized away), converts to the flax layout, grafts into a freshly-initialized
``FusionClassifier`` with per-leaf SHAPE validation (a checkpoint trained at a
different clip geometry fails loudly), prints a per-tensor digest manifest
(name, shape, sha256) for provenance, and writes the grafted variables as a
native msgpack checkpoint loadable by the trainer/engine.

Everything here runs on CPU — safe on a machine with a dead/absent TPU tunnel.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def tensor_digest(tree) -> dict:
    """{leaf_path: {shape, dtype, sha256[:16]}} for a params tree."""
    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        a = np.asarray(leaf)
        out[path] = {
            "shape": list(a.shape),
            "dtype": str(a.dtype),
            "sha256": hashlib.sha256(a.tobytes()).hexdigest()[:16],
        }
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="torch .pt/.pth/.bin or numpy .npz state dict")
    ap.add_argument("--backbone", required=True,
                    help="videomae_{small,base,large} | resnet18 | mobilenet_v2")
    ap.add_argument("--out", default=None,
                    help="write grafted variables here (.msgpack); default: "
                         "alongside the checkpoint")
    ap.add_argument("--manifest", default=None,
                    help="write the digest manifest JSON here (default: <out>.manifest.json)")
    ap.add_argument("--set", action="append", default=[],
                    help="config override, e.g. --set data.video_resize=[160,160]")
    ap.add_argument("--dry-run", action="store_true",
                    help="validate the checkpoint WITHOUT building a model: "
                         "load + envelope-normalize + layout-convert, then "
                         "print a schema/digest report (fast; catches missing "
                         "keys, wrong variant, final-norm mismatch)")
    args = ap.parse_args()

    from tpuhar.config import Config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.models.convert import graft_model_video_weights
    from tpuhar.models.video import VIT_CONFIGS
    from tpuhar.train.checkpoint import save_params

    cfg = Config()
    cfg.model.video_backbone = args.backbone
    for override in args.set:
        key, value = override.split("=", 1)
        cfg.override(key, value)

    if args.dry_run:
        from tpuhar.models.convert import convert_video_backbone, load_state_dict

        sd = load_state_dict(args.checkpoint)
        print(f"loaded {len(sd)} tensors from {args.checkpoint}", file=sys.stderr)
        converted = convert_video_backbone(sd, cfg)  # raises diagnosably on schema mismatch
        tree = converted[0] if isinstance(converted, tuple) else converted
        report = {
            "dry_run": True,
            "source": str(args.checkpoint),
            "backbone": args.backbone,
            "source_tensors": len(sd),
            "converted_video_encoder_tensors": tensor_digest(tree),
        }
        if isinstance(converted, tuple) and converted[1]:
            report["converted_batch_stats_tensors"] = tensor_digest(converted[1])
        mpath = Path(args.manifest or (args.checkpoint + ".dryrun.json"))
        mpath.write_text(json.dumps(report, indent=1))
        n = len(report["converted_video_encoder_tensors"])
        print(f"DRY RUN OK: checkpoint converts cleanly to {n} "
              f"{args.backbone} tensors\nreport -> {mpath}")
        return

    d = cfg.data
    model = FusionClassifier(cfg)
    # flax init executes the forward: CNN param shapes are H/W/T-free, so init
    # tiny; ViTs need the real clip shape for the positional table (CLAUDE.md)
    if args.backbone in VIT_CONFIGS:
        H, W = d.video_resize
        T = d.video_frames_per_window
    else:
        (H, W), T = (32, 32), 2
    print(f"initializing {args.backbone} fusion model (CPU)...", file=sys.stderr)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, d.imu_channels, d.imu_window_size)),
        jnp.zeros((1, T, H, W, 3)),
    )
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}) or {})

    print(f"grafting {args.checkpoint} ...", file=sys.stderr)
    params, batch_stats = graft_model_video_weights(
        params, batch_stats, cfg, path=args.checkpoint
    )
    print("shape validation OK (every video_encoder leaf matched)", file=sys.stderr)

    out = Path(args.out or (Path(args.checkpoint).with_suffix(".grafted.msgpack")))
    out.parent.mkdir(parents=True, exist_ok=True)
    grafted = {"params": params}
    if batch_stats:
        grafted["batch_stats"] = batch_stats
    save_params(out, grafted)

    manifest = {
        "source": str(args.checkpoint),
        "backbone": args.backbone,
        "out": str(out),
        "video_encoder_tensors": tensor_digest(params["video_encoder"]),
    }
    mpath = Path(args.manifest or (str(out) + ".manifest.json"))
    mpath.write_text(json.dumps(manifest, indent=1))
    n = len(manifest["video_encoder_tensors"])
    print(f"grafted {n} video-encoder tensors -> {out}\nmanifest -> {mpath}")


if __name__ == "__main__":
    main()
