"""Fused GroupNorm(+SiLU) Pallas TPU kernel (forward + input-gradient VJP).

The UNet/VAE are GroupNorm-dominated on the HBM side: XLA computes the
fp32 stats and the normalize/affine/SiLU chain as separate passes over the
activation slab.  This kernel does one read + one write per direction:
stats in fp32 (numerics match nn.GroupNorm fp32), IO in the tensor dtype.

Cross-lane group reductions use a [C, G] group-assignment matrix instead of
reshapes: col_sums(x) @ M -> per-group sums; broadcast back via M^T.  All
shapes stay [rows, C], fully lane-aligned.

gamma/beta gradients are NOT produced — in this framework GroupNorm lives
only inside the FROZEN UNet/VAE (SURVEY §2: only LoRA + embeddings train),
so only the input cotangent flows.  The dispatcher falls back to XLA when
params require grads (never in the shipped configs) or slabs exceed VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

_DEFAULT_IMPL = os.environ.get("TEXTBOOST_GROUP_NORM", "auto")

# The whole-sample slab strategy needs several fp32 copies of the
# [rows, C] block live at once (~4-5x slab bytes); the default 16 MB
# scoped-vmem limit rejects the 64x64x320 SD layer on a real chip even
# though v5e has 128 MB of physical VMEM.  Lift the Mosaic limit and keep
# _MAX_SLAB_BYTES as the true budget knob.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def set_group_norm_impl(impl: str) -> None:
    """auto: fused on TPU where the slab fits; xla: always flax math;
    fused: force the Pallas kernel (tests)."""
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "fused")
    _DEFAULT_IMPL = impl


def group_norm_impl() -> str:
    return _DEFAULT_IMPL


def _group_matrix(c: int, g: int) -> jnp.ndarray:
    """[C, G] one-hot group assignment (float32)."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    return (ch // (c // g) == gr).astype(jnp.float32)


def _fwd_kernel(x_ref, gamma_ref, beta_ref, o_ref, mean_ref, rstd_ref,
                *, num_groups, eps, silu):
    x = x_ref[:].astype(jnp.float32)  # [ROWS, C]
    rows, c = x.shape
    m = _group_matrix(c, num_groups)
    n = rows * (c // num_groups)

    s1 = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    g1 = jax.lax.dot_general(s1, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [1, G]
    g2 = jax.lax.dot_general(s2, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mean = g1 / n
    var = g2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    mean_c = jax.lax.dot_general(mean, m, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [1, C]
    rstd_c = jax.lax.dot_general(rstd, m, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[:] = y.astype(o_ref.dtype)
    pad = mean_ref.shape[-1] - num_groups
    mean_ref[:] = jnp.broadcast_to(
        jnp.pad(mean, ((0, 0), (0, pad))), mean_ref.shape
    )
    rstd_ref[:] = jnp.broadcast_to(
        jnp.pad(rstd, ((0, 0), (0, pad))), rstd_ref.shape
    )


def _bwd_kernel(x_ref, gamma_ref, beta_ref, mean_ref, rstd_ref, dy_ref, dx_ref,
                *, num_groups, eps, silu):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    rows, c = x.shape
    m = _group_matrix(c, num_groups)
    n = rows * (c // num_groups)

    mean = mean_ref[:][:1, :num_groups]  # [1, G]
    rstd = rstd_ref[:][:1, :num_groups]
    mean_c = jax.lax.dot_general(mean, m, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd, m, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    gamma = gamma_ref[:].astype(jnp.float32)
    x_hat = (x - mean_c) * rstd_c

    if silu:
        z = x_hat * gamma + beta_ref[:].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        dy = dy * sig * (1.0 + z * (1.0 - sig))

    dzh = dy * gamma  # grad wrt x_hat

    def group_mean(t):  # [ROWS, C] -> per-group mean broadcast to [1, C]
        col = jnp.sum(t, axis=0, keepdims=True)
        gsum = jax.lax.dot_general(col, m, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return jax.lax.dot_general(gsum / n, m, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    dx = rstd_c * (dzh - group_mean(dzh) - x_hat * group_mean(dzh * x_hat))
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _run_fwd(x, gamma, beta, num_groups, eps, silu, interpret):
    b, rows, c = x.shape
    kernel = functools.partial(
        _fwd_kernel, num_groups=num_groups, eps=eps, silu=silu
    )
    y, mean, rstd = pl.pallas_call(
        kernel,
        grid=(b,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((None, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, c), x.dtype),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x, gamma[None], beta[None])
    return y, mean, rstd


def _run_bwd(x, gamma, beta, mean, rstd, dy, num_groups, eps, silu, interpret):
    b, rows, c = x.shape
    kernel = functools.partial(
        _bwd_kernel, num_groups=num_groups, eps=eps, silu=silu
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((None, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), dy.dtype),
        interpret=interpret,
    )(x, gamma[None], beta[None], mean, rstd, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn(x, gamma, beta, num_groups, eps, silu, interpret):
    y, _, _ = _run_fwd(x, gamma, beta, num_groups, eps, silu, interpret)
    return y


def _fused_gn_fwd(x, gamma, beta, num_groups, eps, silu, interpret):
    y, mean, rstd = _run_fwd(x, gamma, beta, num_groups, eps, silu, interpret)
    return y, (x, gamma, beta, mean, rstd)


def _fused_gn_bwd(num_groups, eps, silu, interpret, res, dy):
    x, gamma, beta, mean, rstd = res
    dx = _run_bwd(x, gamma, beta, mean, rstd, dy, num_groups, eps, silu, interpret)
    # Frozen-affine contract: no gamma/beta cotangents (see module docstring).
    return dx, jnp.zeros_like(gamma), jnp.zeros_like(beta)


_fused_gn.defvjp(_fused_gn_fwd, _fused_gn_bwd)

# VMEM budget for one [rows, C] fp32 working slab (v5e: 16 MB more or less
# two such slabs live at once in the bwd kernel).
_MAX_SLAB_BYTES = 6 * 1024 * 1024


def supports_fused(rows: int, c: int, num_groups: int) -> bool:
    # SD channel counts are multiples of 64 (320/640/1280); Mosaic pads the
    # lane dimension internally.
    return (
        c % 64 == 0
        and c % num_groups == 0
        and num_groups <= 128
        and rows % 8 == 0
        and rows * c * 4 <= _MAX_SLAB_BYTES
    )


def fused_group_norm(
    x: jnp.ndarray,  # [B, H, W, C] or [B, rows, C]
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    *,
    eps: float = 1e-5,
    silu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm (+optional SiLU epilogue), fp32 stats, IO in x.dtype."""
    shape = x.shape
    c = shape[-1]
    rows = 1
    for d in shape[1:-1]:
        rows *= d
    x3 = x.reshape(shape[0], rows, c)
    y = _fused_gn(x3, gamma, beta, num_groups, eps, silu, interpret)
    return y.reshape(shape)
