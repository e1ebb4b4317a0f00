"""Device mesh construction and sharding specs.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(``main.py:89-95``) — replicate the model, scatter the batch, gather outputs, with
``module.``-prefix surgery on checkpoints.  The TPU-native equivalent is a
``jax.sharding.Mesh`` over ICI with GSPMD:

- **data axis**: the batch dimension is sharded; gradients are reduced by
  XLA-inserted ``psum`` over ICI — DataParallel without the scatter/gather host hops.
- **model axis**: Megatron-style tensor parallelism for the video transformer's
  attention heads and MLP hidden dim (column-parallel in, row-parallel out), expressed
  purely as parameter PartitionSpecs; XLA inserts the collectives.

Checkpoints are mesh-independent PyTrees — resharding on load is a ``device_put``.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence] = None,
    *,
    model_axis_size: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Mesh of shape ``(n_devices // model_axis_size, model_axis_size)``."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_axis_size != 0:
        raise ValueError(f"{n} devices not divisible by model_axis_size={model_axis_size}")
    grid = np.asarray(devices).reshape(n // model_axis_size, model_axis_size)
    return Mesh(grid, (data_axis, model_axis))


def maybe_mesh(config=None, devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """Mesh for pipeline-level parallel training, or ``None`` on a single device.

    Honors ``training.data_parallel`` (off switch) and ``training.model_axis_size``
    (TP degree); trims the device list to a multiple of the TP degree. This is the
    TPU-native analogue of the reference's "wrap in DataParallel when >1 GPU"
    (``main.py:89-95``) — except sharding also covers optimizer state and allows a
    model axis.
    """
    t = getattr(config, "training", None)
    if t is not None and not bool(getattr(t, "data_parallel", True)):
        return None
    model_axis_size = max(int(getattr(t, "model_axis_size", 1) or 1), 1) if t else 1
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < 2 and model_axis_size <= 1:
        return None
    n = (len(devices) // model_axis_size) * model_axis_size
    if n < model_axis_size:
        raise ValueError(
            f"model_axis_size={model_axis_size} needs at least that many devices; "
            f"have {len(devices)}"
        )
    return create_mesh(
        devices[:n],
        model_axis_size=model_axis_size,
        data_axis=getattr(t, "data_axis", "data") if t else "data",
        model_axis=getattr(t, "model_axis", "model") if t else "model",
    )


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------------
# Tensor-parallel parameter rules
# ---------------------------------------------------------------------------------
# (path regex, partition spec builder given model axis name). Paths are
# '/'-joined flax param paths. Dense kernels are (in, out); flax attention kernels are
# (d_model, heads, head_dim) for q/k/v and (heads, head_dim, d_model) for out.
def tp_rules(model_axis: str = "model"):
    return [
        # ViT / fusion MLPs: column-parallel in, row-parallel out
        (re.compile(r".*mlp_in/kernel$"), P(None, model_axis)),
        (re.compile(r".*mlp_in/bias$"), P(model_axis)),
        (re.compile(r".*mlp_out/kernel$"), P(model_axis, None)),
        # torch-style transformer blocks (IMU encoder)
        (re.compile(r".*linear1/kernel$"), P(None, model_axis)),
        (re.compile(r".*linear1/bias$"), P(model_axis)),
        (re.compile(r".*linear2/kernel$"), P(model_axis, None)),
        # attention: shard heads
        (re.compile(r".*attn/(query|key|value)/kernel$"), P(None, model_axis, None)),
        (re.compile(r".*attn/(query|key|value)/bias$"), P(model_axis, None)),
        (re.compile(r".*attn/out/kernel$"), P(model_axis, None, None)),
    ]


def spec_for_path(path: str, rules) -> P:
    for pattern, spec in rules:
        if pattern.match(path):
            return spec
    return P()  # replicated


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def partition_specs(params, mesh: Mesh, model_axis: str = "model"):
    """PartitionSpec tree for a param tree under the TP rules.

    Specs whose sharded dimension does not divide evenly by the mesh axis fall back to
    replication (keeps arbitrary model sizes valid on any mesh).
    """
    rules = tp_rules(model_axis)
    axis_size = mesh.shape[model_axis]

    def spec_leaf(key_path, leaf):
        spec = spec_for_path(_path_str(key_path), rules)
        if axis_size == 1:
            return P()
        for dim, name in enumerate(spec):
            if name is not None:
                if dim >= leaf.ndim or leaf.shape[dim] % axis_size != 0:
                    return P()
        return spec

    return jax.tree_util.tree_map_with_path(spec_leaf, params)


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """device_put a param tree according to the TP rules (replicated where unmatched)."""
    specs = partition_specs(params, mesh, model_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_state(state, mesh: Mesh, model_axis: str = "model"):
    """Shard a TrainState: params and their optimizer moments per TP rules,
    batch_stats replicated.

    AdamW's ``mu``/``nu`` subtrees embed the param tree, so each moment leaf's path
    ends with its parameter's path — the spec lookup strips the optimizer prefix and
    reuses the parameter's PartitionSpec (moments co-sharded with their params, as any
    sane TP layout requires).
    """
    param_specs = partition_specs(state.params, mesh, model_axis)
    flat_param_specs: dict = {}
    jax.tree_util.tree_map_with_path(
        lambda kp, s: flat_param_specs.setdefault(_path_str(kp), s), param_specs
    )

    new_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state.params, param_specs
    )

    # longest-first so a short param path that happens to be a suffix of another
    # param's path can never shadow the true owner
    ordered_param_specs = sorted(
        flat_param_specs.items(), key=lambda kv: -len(kv[0])
    )

    def put_opt(key_path, leaf):
        path = _path_str(key_path)
        spec = P()
        for ppath, pspec in ordered_param_specs:
            if path.endswith(ppath):
                spec = pspec
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    new_opt = jax.tree_util.tree_map_with_path(put_opt, state.opt_state)
    new_bs = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.batch_stats
    )
    return state.replace(
        params=new_params,
        opt_state=new_opt,
        batch_stats=new_bs,
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Shard every array's leading axis over the data axis."""
    sh = batch_sharding(mesh, data_axis)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.shape[data_axis] == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, batch)
