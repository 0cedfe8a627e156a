"""Pallas TPU flash attention (forward + backward).

Replaces the XLA softmax-attention chain for the UNet's large spatial
self-attentions (seq 4096 at 64x64 latents), where materializing the
[B,H,N,N] score matrix is HBM-bandwidth-bound.  Online-softmax streaming
over K/V blocks keeps everything in VMEM; the backward pass recomputes
P blockwise from the saved logsumexp in ONE fused kernel (gridded over
K blocks; dq accumulates fp32 in a revisited output) — 5 matmuls per
tile pair vs the classic two-kernel recipe's 7.

Layout: [BH, N, D] with batch*heads folded into the grid's leading dim.
D is zero-padded to the 128-lane boundary by the wrapper; N must divide
into the chosen blocks (the dispatcher falls back to XLA otherwise).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# d=512 (VAE mid-block, single head) holds [n_kv, 512] K/V refs plus f32
# working tiles — past Mosaic's default 16 MB scoped-VMEM budget.  v5e has
# 128 MB physical VMEM; lift the limit like ops/group_norm.py does.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _block(n: int, target: int) -> int:
    b = min(n, target)
    while n % b:
        b //= 2
    return max(b, 128) if n % max(b, 128) == 0 else b


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, n_kv, kv_len):
    # q_ref: [BQ, D]; k_ref/v_ref: [NKV, D]; o_ref: [BQ, D]; lse_ref: [BQ, 128]
    # kv_len: real (unpadded) KV length; columns >= kv_len are masked out.
    q = q_ref[:].astype(jnp.float32) * scale
    bq, d = q.shape
    num_kb = n_kv // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK]
        if kv_len < n_kv:
            col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)
    lse = m + jnp.log(l)  # [BQ, 1]
    lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _fwd(q, k, v, scale, block_q, block_k, kv_len, interpret):
    bh, n, d = q.shape
    n_kv = k.shape[1]
    grid = (bh, n // block_q)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, n_kv=n_kv, kv_len=kv_len
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_kv, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_kv, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 128), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(q, k, v)
    return out, lse[:, :, :1]


# ---------------------------------------------------------------------------
# Backward — single fused kernel.
#
# Gridded (bh, kv-block); each program computes s / p / dp / ds ONCE for
# its (q-block, k-block) tiles and accumulates all three gradients:
# dk/dv for its k-block, and dq for every q-block via an output that is
# revisited (index map constant in the kv-block dim) and accumulated in
# fp32 across sequential grid steps.  Versus the classic two-kernel
# split (dKV gridded over K + a second dQ pass) this removes the
# recomputation of s and dp — 5 matmuls per tile pair instead of 7 —
# measured 95 -> ~70 ms/step of flash time in the sd15 train step.
# ---------------------------------------------------------------------------
def _bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref, dk_ref, dv_ref,
    *, scale, block_q, n_q, block_k, n_kv, kv_len,
):
    # k_ref/v_ref: [BK, D] (this program's k-block); q/do/stats: full N.
    # stats packs lse (lane 0) and delta (lane 1) into ONE [N, 128] f32
    # buffer — two separate 128-lane broadcasts blew the 16 MB scoped-VMEM
    # limit once Mosaic double-buffers every varying operand.
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    bk, d = k.shape
    num_qb = n_q // block_q
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init_dq():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = stats_ref[pl.ds(i * block_q, block_q), 0:1]
        delta = stats_ref[pl.ds(i * block_q, block_q), 1:2]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK]
        p = jnp.exp(s - lse)
        if kv_len < n_kv:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 1
            )
            p = jnp.where(col < kv_len, p, 0.0)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BK, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK]
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BK, D]  (q already has scale folded in)
        sl = pl.ds(i * block_q, block_q)
        dq_ref[sl, :] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _bwd(scale, block_q, block_k, kv_len, interpret, residuals, dout):
    q, k, v, out, lse = residuals
    bh, n, d = q.shape
    n_kv = k.shape[1]
    delta = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1,
                    keepdims=True)  # [BH, N, 1]
    # lse in lane 0, delta in lane 1, zero-padded to the 128-lane tile.
    stats = jnp.pad(
        jnp.concatenate([lse, delta], axis=-1), ((0, 0), (0, 0), (0, 126))
    )

    kernel = functools.partial(
        _bwd_fused_kernel, scale=scale, block_q=block_q, n_q=n,
        block_k=block_k, n_kv=n_kv, kv_len=kv_len,
    )
    dq32, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, n_kv // block_k),
        in_specs=[
            pl.BlockSpec((None, n, d), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, d), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, 128), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # dq: revisited across the kv-block dim; fp32 accumulator.
            pl.BlockSpec((None, n, d), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_kv, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_kv, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, dout, stats)
    dq = (dq32 * scale).astype(q.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper on [BH, N, D]
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_bhnd(q, k, v, scale, block_q, block_k, bwd_block_q, bwd_block_k,
                kv_len, interpret):
    out, _ = _fwd(q, k, v, scale, block_q, block_k, kv_len, interpret)
    return out


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, bwd_block_q,
                    bwd_block_k, kv_len, interpret):
    out, lse = _fwd(q, k, v, scale, block_q, block_k, kv_len, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(scale, block_q, block_k, bwd_block_q, bwd_block_k,
                    kv_len, interpret, residuals, dout):
    return _bwd(scale, bwd_block_q, bwd_block_k, kv_len, interpret,
                residuals, dout)


_flash_bhnd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def supports_flash(n_q: int, n_kv: int, d: int) -> bool:
    """Shapes the kernel handles.  KV length is padded to the 128 boundary
    by the wrapper (tail masked in-kernel), so only Q needs divisibility.
    d up to 512 covers the VAE mid-block single-head attention (the
    pallas_call raises the Mosaic VMEM limit to hold the wider K/V)."""
    return n_q % 128 == 0 and n_q >= 256 and d <= 512


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
    bwd_block_q: int = 256,
    bwd_block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, N, H, D] (ops/attention.py layout).

    Handles short/unaligned KV (cross-attention over 77 text tokens) by
    zero-padding KV to the 128 boundary and masking the tail in-kernel.

    Block defaults are tuned on v5e at the sd15 UNet hot shape (bs8,
    seq4096, h8, d40; tools/bench_flash.py): fwd is fastest at
    (block_q=512, block_k=1024), the fused backward at
    (block_q=256, block_k=1024) — each ~11% over the previous
    (256, 512) defaults."""
    b, n, h, d = q.shape
    n_kv = k.shape[1]
    if not supports_flash(n, n_kv, d):
        # XLA fallback for shapes outside the kernel's envelope.
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", probs, v)

    kv_pad = (-n_kv) % 128
    n_kv_padded = n_kv + kv_pad
    block_q = _block(n, block_q)
    block_k = _block(n_kv_padded, block_k)
    bwd_block_q = _block(n, bwd_block_q)
    bwd_block_k = _block(n_kv_padded, bwd_block_k)

    # Pad head dim to the 128-lane boundary; zero columns do not change
    # softmax(q k^T) v and receive zero gradients.  With
    # TEXTBOOST_FLASH_NOPAD=1 the unaligned head dim is passed through and
    # Mosaic masks the lane tail instead (experiment: trades the explicit
    # HBM pad/slice copies for unaligned VMEM tiles).
    import os

    d_pad = 0 if os.environ.get("TEXTBOOST_FLASH_NOPAD") == "1" else (-d) % 128
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)
    qt, kt, vt = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    if d_pad:
        padder = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, d_pad)))
        qt, kt, vt = padder(qt), padder(kt), padder(vt)
    if kv_pad:
        kv_padder = lambda x: jnp.pad(x, ((0, 0), (0, kv_pad), (0, 0)))
        kt, vt = kv_padder(kt), kv_padder(vt)

    out = _flash_bhnd(qt, kt, vt, scale, block_q, block_k, bwd_block_q,
                      bwd_block_k, n_kv, interpret)
    out = out[:, :, :d].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)
