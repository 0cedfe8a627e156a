"""Capture a jax.profiler trace of the flagship train step on the real
chip and print the top device ops by self time.

Usage:  python tools/profile_step.py [--steps 6] [--outdir /tmp/tb_trace]

The axon relay ACKs block_until_ready before real execution for
independent dispatches, but the state->state dependency chain of the
train step serializes execution, so the captured device timeline is
honest.  Summarizes with jax.profiler.ProfileData (no tensorboard
needed).
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

from textboost_tpu.utils.platform import configure_compilation_cache  # noqa: E402

configure_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--outdir", default="/tmp/tb_trace")
    ap.add_argument("--preset", default="sd15")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    from bench import build_train_bench

    jit_step, state, batch, frozen = build_train_bench(
        args.preset, args.batch_size, args.resolution, 4, remat=False
    )
    state, m = jit_step(state, batch, frozen)
    float(m["loss"])  # warm + true completion barrier (d2h)

    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            state, m = jit_step(state, batch, frozen)
        float(m["loss"])

    paths = sorted(glob.glob(os.path.join(args.outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane.pb captured under", args.outdir)
        return
    summarize(paths[-1], args.top, args.steps)


def summarize(path: str, top: int, steps: int):
    from jax.profiler import ProfileData

    data = ProfileData.from_file(path)
    for plane in data.planes:
        total = collections.Counter()
        count = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                total[name] += ev.duration_ns
                count[name] += 1
        if not total:
            continue
        print(f"\n=== plane: {plane.name} (total {sum(total.values())/1e6:.1f} ms"
              f" over {steps} steps) ===")
        for name, ns in total.most_common(top):
            print(f"{ns/1e6/steps:9.3f} ms/step  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
