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


def select_devices(n: int, devices: Optional[Sequence] = None):
    """Pick `n` devices spread evenly across processes.

    `jax.devices()[:n]` would land entirely on process 0 in a multi-host
    job, leaving other processes with no addressable shard of the mesh;
    instead take n/process_count local devices from every process.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_proc = jax.process_count()
    if n_proc == 1:
        return devices[:n]
    if n % n_proc:
        raise ValueError(
            f"cannot spread {n} mesh devices over {n_proc} processes evenly"
        )
    per_proc = n // n_proc
    out = []
    for p in range(n_proc):
        local = [d for d in devices if d.process_index == p]
        if len(local) < per_proc:
            raise ValueError(
                f"process {p} has {len(local)} devices, need {per_proc}"
            )
        out.extend(local[:per_proc])
    return out


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


def assemble_global_batch(mesh: Mesh, arrays):
    """Per-process local batch dict -> global dp-sharded jax.Arrays.

    The multi-host counterpart of the reference's DDP per-rank batches
    (train_textboost.py:918-926): each JAX process loads its own shard of
    the global batch (data/sharding.py) and contributes it here.  Single
    process keeps the plain async `device_put` fast path; multi-process
    assembles one global array whose leading axis spans all processes via
    `jax.make_array_from_process_local_data`.
    """
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
            for k, v in arrays.items()
        }
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        sharding = batch_sharding(mesh, v.ndim)
        global_shape = (v.shape[0] * jax.process_count(),) + tuple(v.shape[1:])
        out[k] = jax.make_array_from_process_local_data(sharding, v, global_shape)
    return out


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


def tp_rule_report(params, mesh: Mesh):
    """Which `_TP_RULES` fire over a param tree at this mesh's tp degree.

    Works on real arrays or `jax.ShapeDtypeStruct` trees (shapes suffice).
    Returns (counts, indivisible): counts maps every rule pattern to the
    number of leaves it sharded; indivisible maps leaf paths that matched a
    rule but could not divide by tp (those fall back to replicated in
    `param_sharding` — silently, which is exactly what a report is for).
    VERDICT r4 #4: the sd15-dims multichip validation asserts every rule
    fires and nothing is indivisible."""
    counts = {pattern: 0 for pattern, _ in _TP_RULES}
    indivisible = {}

    def visit(path, leaf):
        p = _path_str(path)
        for pattern, spec in _TP_RULES:
            if re.match(pattern, p):
                ok = all(
                    leaf.shape[axis] % mesh.shape["tp"] == 0
                    for axis, name in enumerate(spec)
                    if name == "tp"
                )
                if ok:
                    counts[pattern] += 1
                    return  # first divisible match wins, as in param_sharding
                indivisible[p] = tuple(leaf.shape)

    jax.tree_util.tree_map_with_path(visit, params)
    return counts, indivisible


def put_global(x, sharding: NamedSharding):
    """device_put that is collective-free on multi-process meshes.

    `jax.device_put` onto a sharding that spans non-addressable devices runs
    a cross-process equality check (a collective) — it fires mid-setup while
    processes are still staggered in compile, blowing the transport's
    context-init window.  Building the global array from per-device local
    puts has identical semantics for host-identical inputs (every process
    loads the same checkpoint) without any communication.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    locals_ = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, locals_)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    return jax.tree.map(
        put_global, params, param_sharding(params, mesh, tensor_parallel)
    )
