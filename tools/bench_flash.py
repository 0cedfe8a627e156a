"""Flash-attention block-size tuning micro-bench (real chip).

Times fwd and fwd+bwd at the sd15 UNet's hot shape (bs8, seq4096, h8,
d40) for a grid of (block_q, block_k), plus the VAE mid-block shape
(bs8, seq4096, h1, d512) forward-only, against the XLA path.

Chained iterations (each feeds the next) defeat the relay's
ack-before-execute and dedupe behaviors (CLAUDE.md).
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textboost_tpu.utils.platform import apply_platform_override


def chain_time(fn, x, iters=20):
    """Run fn iters times with a data dependency; returns ms/iter."""

    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    out = loop(x)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(out)
    jax.block_until_ready(out)
    return 1000.0 * (time.perf_counter() - t0) / iters


def bench_shape(b, n, h, d, block_qs, block_ks, with_bwd=True):
    from textboost_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, n, h, d), jnp.bfloat16)
    scale = d ** -0.5

    results = {}

    def xla_attn(q):
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, q,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", p, q)

    def fwd_only(impl):
        def f(x):
            return impl(x).astype(x.dtype) + x * 1e-6  # keep chain nontrivial
        return f

    def fwd_bwd(impl):
        def loss(x):
            return jnp.sum(impl(x).astype(jnp.float32) ** 2)

        def f(x):
            g = jax.grad(loss)(x)
            return (x + 1e-6 * g).astype(x.dtype)

        return f

    try:
        results["xla fwd"] = chain_time(fwd_only(xla_attn), q)
        if with_bwd:
            results["xla fwd+bwd"] = chain_time(fwd_bwd(xla_attn), q)
    except Exception as e:  # noqa: BLE001
        results["xla"] = f"ERR {repr(e)[:80]}"

    for bq in block_qs:
        for bk in block_ks:
            tag = f"flash bq{bq} bk{bk}"
            # fwd cells vary the forward blocks; fwd+bwd cells vary the
            # BACKWARD blocks (forward stays at its tuned defaults) —
            # otherwise the grid silently re-measures the default bwd
            # blocks in every cell and the "best" bwd choice is noise.
            fwd_impl = functools.partial(
                flash_attention, k=q, v=q, scale=scale, block_q=bq, block_k=bk
            )
            bwd_impl = functools.partial(
                flash_attention, k=q, v=q, scale=scale,
                bwd_block_q=bq, bwd_block_k=bk,
            )
            try:
                results[tag + " fwd"] = chain_time(
                    fwd_only(lambda x: fwd_impl(x)), q
                )
                if with_bwd:
                    results[f"flash bwd-bq{bq} bwd-bk{bk} fwd+bwd"] = chain_time(
                        fwd_bwd(lambda x: bwd_impl(x)), q
                    )
            except Exception as e:  # noqa: BLE001
                results[tag] = f"ERR {repr(e)[:80]}"
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--shape", default="unet64",
                    choices=["unet64", "unet32", "vae"])
    args = ap.parse_args()
    apply_platform_override()
    print("devices:", jax.devices())

    if args.shape == "unet64":
        res = bench_shape(8, 4096, 8, 40, [128, 256, 512], [256, 512, 1024])
    elif args.shape == "unet32":
        res = bench_shape(8, 1024, 8, 80, [128, 256], [256, 512, 1024])
    else:
        res = bench_shape(8, 4096, 1, 512, [128, 256], [512, 1024],
                          with_bwd=False)
    for k, v in res.items():
        print(f"{k:28s} {v if isinstance(v, str) else f'{v:7.2f} ms'}")


if __name__ == "__main__":
    main()
