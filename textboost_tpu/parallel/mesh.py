"""Device mesh construction and GSPMD sharding rules.

TPU-native counterpart of the reference's Accelerate/NCCL DDP stack
(train_textboost.py:560-565,918-926,1108 and the Wrapper rank queries):
parallelism here is declarative — a `Mesh` over ("dp", "tp") axes plus
NamedShardings; XLA inserts the all-reduces/all-gathers over ICI.

  * dp: batch-sharded data parallelism (the reference's only strategy).
  * tp: optional tensor parallelism over attention heads / FFN columns of
    the frozen UNet + text encoder — a TPU-native extension that lets one
    instance span a pod slice when HBM per chip is tight.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != device count ({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis over dp, rest replicated."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Place a host-global numpy batch onto the mesh, leading axis over dp."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


# ---------------------------------------------------------------------------
# Tensor-parallel partition rules (regex on flattened param path -> spec).
# Column-parallel on input projections, row-parallel on output projections:
# XLA then emits one all-reduce per attention/FFN block over the tp axis.
# ---------------------------------------------------------------------------
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # CLIP attention: qkv column-parallel, out row-parallel.
    (r".*self_attn/(q|k|v)_proj/kernel$", P(None, "tp")),
    (r".*self_attn/(q|k|v)_proj/bias$", P("tp")),
    (r".*self_attn/out_proj/kernel$", P("tp", None)),
    # CLIP MLP.
    (r".*mlp/fc1/kernel$", P(None, "tp")),
    (r".*mlp/fc1/bias$", P("tp")),
    (r".*mlp/fc2/kernel$", P("tp", None)),
    # UNet cross/self attention.
    (r".*attn[12]/to_(q|k|v)/kernel$", P(None, "tp")),
    (r".*attn[12]/to_out/kernel$", P("tp", None)),
    # UNet GEGLU FF: proj column-parallel, net_2 row-parallel.
    (r".*ff/net_0/proj/kernel$", P(None, "tp")),
    (r".*ff/net_0/proj/bias$", P("tp")),
    (r".*ff/net_2/kernel$", P("tp", None)),
    # Token embedding: shard rows (vocab) over tp to spread the big matrix.
    (r".*token_embedding$", P("tp", None)),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_sharding(params, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding pytree for a param tree: TP rules where they match
    (and divide evenly), replicated otherwise."""

    def assign(path, leaf):
        p = _path_str(path)
        if tensor_parallel and mesh.shape.get("tp", 1) > 1:
            for pattern, spec in _TP_RULES:
                if re.match(pattern, p):
                    # Check divisibility of each sharded axis.
                    ok = True
                    for axis, name in enumerate(spec):
                        if name == "tp" and leaf.shape[axis] % mesh.shape["tp"]:
                            ok = False
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    return jax.tree.map(
        jax.device_put, params, param_sharding(params, mesh, tensor_parallel)
    )
