#!/usr/bin/env python
"""Width/variant sweep for TPUVideoCNN using the bench chained-loop method."""
import sys, time
from functools import partial
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def log(m):
    print(m, file=sys.stderr, flush=True)

def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_config
    from tpuhar.models.crossmodal import FusionClassifier
    from tpuhar.models import video as V
    from tpuhar.ops.featurize import featurize_windows
    from tpuhar.ops.video import normalize_clip
    from tpuhar.ood import energy_score, msp_score

    batch = 256
    cfg = _flagship_config()
    cfg.model.video_backbone = "tpu_cnn"
    d = cfg.data
    H, W = d.video_resize
    T = d.video_frames_per_window
    npr = np.random.default_rng(0)
    imu = jax.device_put(npr.normal(0, 8000, size=(batch, 250, 6)).astype(np.float32))
    video = jax.device_put((npr.random((batch, T, H, W, 3)) * 255).astype(np.uint8))

    variants = []
    for arg in sys.argv[1:] or ["256,512", "384,512"]:
        widths = tuple(int(x) for x in arg.split(","))
        variants.append(widths)

    import flax.linen as nn
    for widths in variants:
        # monkeypatch the backbone widths via a subclassed encoder
        class Enc(V.VideoEncoder):
            @nn.compact
            def __call__(self, x, *, train: bool = False):
                B, Tt = x.shape[0], x.shape[1]
                x = x.astype(self.dtype)
                net = V.TPUVideoCNN(widths=widths, dtype=self.dtype, name="backbone")
                frames = x.reshape((B * Tt,) + x.shape[2:])
                feats = net(frames, train=train).reshape(B, Tt, -1)
                tokens = nn.Dense(self.video_d_model, dtype=self.dtype, name="projection")(feats)
                return jnp.mean(tokens, axis=1).astype(jnp.float32), tokens

        model = FusionClassifier(cfg)
        # swap the video encoder by building params with the custom encoder inline:
        # simplest: time the ENCODER alone plus a constant for the rest (~4 ms)
        enc = Enc(backbone="tpu_cnn", video_d_model=cfg.model.video_d_model, dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            ev = jax.jit(lambda k, v: enc.init(k, normalize_clip(v)))(
                jax.random.PRNGKey(0), np.zeros((1, 2, 32, 32, 3), np.uint8)
            )

        def enc_fn(vid_u8):
            emb, _ = enc.apply(ev, normalize_clip(vid_u8), train=False)
            return {"logits": emb}

        @partial(jax.jit, static_argnames=("k",))
        def chained(video, k: int):
            def body(i, carry):
                v, acc = carry
                out = enc_fn(jnp.roll(v, i, axis=0))
                delta = jnp.sum(out["logits"]) * 1e-12
                return v, acc + delta
            _, acc = jax.lax.fori_loop(0, k, body, (video, jnp.float32(0)))
            return acc

        def run(k):
            t0 = time.perf_counter()
            float(np.asarray(chained(video, k)))
            return time.perf_counter() - t0

        run(1); run(10)
        t1 = min(run(1) for _ in range(2))
        tk = min(run(10) for _ in range(2))
        step = (tk - t1) / 9 * 1e3
        log(f"tpu_cnn widths={widths}: encoder {step:7.2f} ms/step (+~4ms rest → "
            f"~{batch / (step + 4) * 1e3:5.0f} inf/s)")

if __name__ == "__main__":
    main()
