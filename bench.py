#!/usr/bin/env python
"""Headline benchmark: TextBoost train-step throughput on real hardware.

Measures the full jitted train step (VAE encode -> text encode -> frozen
UNet forward + backward-through-activations -> grad surgery -> AdamW ->
renorm) at the reference's flagship config: SD1.5 shapes, batch 8, 512px,
TE LoRA r=4 (BASELINE.md: 250 steps x bs 8; north star <2 min on v5e-8).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: measured single-chip steps/sec divided by 2.083 steps/sec —
the rate that completes 250 steps in 120 s.  >= 1.0 means the v5e-8
north-star pace is already met on ONE chip.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def _platform_override():
    from textboost_tpu.utils.platform import (
        apply_platform_override,
        start_device_warmup,
    )

    apply_platform_override()
    # Overlap the relay's per-process first-sync tax with the compiles.
    start_device_warmup()


# Children spawned by bench modes (e2e train subprocess) — killed by the
# watchdog so an abort never orphans a relay-holding process.
_CHILDREN = []

TARGET_STEPS_PER_SEC = 250.0 / 120.0  # north-star pace

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
# Overridable so tests exercise the sidecar path without touching the
# repo's real measurement history.
RESULTS_DIR = os.environ.get(
    "TEXTBOOST_BENCH_RESULTS_DIR", os.path.join(_REPO_ROOT, "bench_results"))


def _emit(result, *, mode="train", kind="final"):
    """Print one JSON result line (flushed) and persist a machine-readable
    sidecar under bench_results/ (VERDICT r4 #9).  The driver parses the
    LAST JSON line on stdout, so provisional lines printed earlier are
    harmlessly superseded by later, better ones — and if the driver's own
    timeout kills the process mid-run, whatever printed last still parses
    (VERDICT r4 #1: BENCH_rNN.json must never be empty again)."""
    print(json.dumps(result), flush=True)
    try:
        os.makedirs(RESULTS_DIR, exist_ok=True)
        rec = {
            "mode": mode,
            "kind": kind,
            "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "argv": sys.argv[1:],
            "result": result,
        }
        # latest_<mode>.json is the last-known-GOOD record: placeholder and
        # degraded lines must not clobber a real prior measurement.
        if kind != "startup" and not result.get("extra", {}).get("degraded"):
            with open(os.path.join(RESULTS_DIR, f"latest_{mode}.json"), "w") as f:
                json.dump(rec, f, indent=1)
        if kind == "final":
            stamp = time.strftime("%Y%m%d_%H%M%S")
            with open(os.path.join(RESULTS_DIR, f"{mode}_{stamp}.json"), "w") as f:
                json.dump(rec, f, indent=1)
    except OSError:
        pass  # sidecars are best-effort; the stdout line is the contract


def _last_known_good(mode="train"):
    """Best previous measurement for this mode: scan the driver-written
    BENCH_r*.json artifacts (highest round wins) then the local
    bench_results sidecars.  Used to make degraded-relay output carry the
    last real number instead of 0.0 (VERDICT r4 #1a)."""
    candidates = []
    try:
        import glob

        if mode == "train":  # BENCH_r artifacts hold train-mode results only
            for path in glob.glob(os.path.join(_REPO_ROOT, "BENCH_r*.json")):
                try:
                    rec = json.load(open(path))
                except (OSError, ValueError):
                    continue
                parsed = rec.get("parsed")
                if parsed and parsed.get("value", 0) > 0:
                    candidates.append(
                        (rec.get("n", 0), os.path.basename(path), parsed))
        side = os.path.join(RESULTS_DIR, f"latest_{mode}.json")
        if os.path.exists(side):
            rec = json.load(open(side))
            res = rec.get("result", {})
            if res.get("value", 0) > 0 and not res.get("extra", {}).get("degraded"):
                # sidecars postdate every BENCH_r artifact in-round
                candidates.append((10**6, "bench_results/latest_%s.json" % mode, res))
    except Exception:
        pass
    if not candidates:
        return None
    n, src, parsed = max(candidates, key=lambda c: c[0])
    return {"source": src, "result": parsed}


def _degraded_result(mode, reason, lkg, extra=None):
    """A final-quality JSON line for when measurement is impossible: carries
    the last-known-good value with an explicit degraded marker + diagnostics
    so the round still has a parseable, honest artifact."""
    base = dict(lkg["result"]) if lkg else {
        "metric": f"bench_{mode}_failed",
        "value": 0.0,
        "unit": "error",
        "vs_baseline": 0.0,
    }
    base["extra"] = {
        **({} if not lkg else dict(lkg["result"].get("extra", {}))),
        "degraded": True,
        "degraded_reason": reason[:400],
        **({"last_known_good_source": lkg["source"]} if lkg else {}),
        **(extra or {}),
    }
    return base


_PROBE_CODE = r"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
t0 = time.time()
from textboost_tpu.utils.platform import apply_platform_override
apply_platform_override()
import jax, jax.numpy as jnp
n_dev = len(jax.devices())
t_init = time.time() - t0
# Non-trivial enough to need a real compile+execute round trip; odd sized so
# it never collides with a cached framework program.  float() is the d2h
# fetch — the only completion barrier the relay honors.
x = jax.jit(lambda a: (a * a + 1.0).sum())(jnp.arange(997, dtype=jnp.float32))
want = sum(i * i for i in range(997)) + 997.0
assert abs(float(x) - want) < 1e-4 * want  # fp32 accumulation tolerance
print("PROBE_OK devices=%d init_s=%.1f total_s=%.1f"
      % (n_dev, t_init, time.time() - t0), flush=True)
"""


def _health_probe(timeout_s):
    """Run a tiny jitted op against the real backend in a SUBPROCESS under a
    hard timeout (the parent never risks the r3-observed client-init hang).
    Healthy relay: ~20 s; degraded: 39 s+; outage: blocks forever — the
    subprocess is killed and the bench reports degraded instead of hanging
    (VERDICT r4 #1a; CLAUDE.md relay-outage recipe).

    Returns {"ok": bool, "seconds": float, "detail": str}."""
    import subprocess

    code = os.environ.get("TEXTBOOST_BENCH_PROBE_TEST_CODE") or _PROBE_CODE
    t0 = time.time()
    try:
        # cwd=repo root: PYTHONPATH breaks axon PJRT plugin discovery, the
        # cwd import path is the only safe way to make the package visible.
        proc = subprocess.run(
            [sys.executable, "-c", code], cwd=_REPO_ROOT, timeout=timeout_s,
            capture_output=True, text=True,
        )
        dt = time.time() - t0
        ok = proc.returncode == 0 and "PROBE_OK" in proc.stdout
        detail = (proc.stdout.strip().splitlines() or [""])[-1] if ok else (
            f"rc={proc.returncode}: {proc.stderr.strip()[-300:]}")
        return {"ok": ok, "seconds": round(dt, 1), "detail": detail}
    except subprocess.TimeoutExpired:
        return {"ok": False, "seconds": round(time.time() - t0, 1),
                "detail": f"probe timed out after {timeout_s}s "
                "(relay unresponsive)"}


class _CompileLog(list):
    """Captures jax's per-program compile logs (--cold breakdown: which
    programs cost what, VERDICT r2 #3).  Needs jax_log_compiles."""

    def start(self):
        import logging
        import re

        self._re = re.compile(
            r"Finished XLA compilation of (\S+) in ([0-9.]+) sec"
        )

        outer = self

        class H(logging.Handler):
            def emit(self, record):
                m = outer._re.search(record.getMessage())
                if m:
                    outer.append((m.group(1), float(m.group(2))))

        import jax

        jax.config.update("jax_log_compiles", True)
        self._handler = H(level=logging.DEBUG)
        for name in ("jax._src.dispatch", "jax._src.interpreters.pxla",
                     "jax._src.compiler"):
            lg = logging.getLogger(name)
            lg.addHandler(self._handler)
            lg.setLevel(logging.DEBUG)

    def breakdown(self, top: int = 8):
        items = sorted(self, key=lambda kv: -kv[1])[:top]
        return {name: round(secs, 1) for name, secs in items}


def build_train_bench(preset: str, batch: int, resolution: int, lora_rank: int, remat: bool = True):
    import jax
    import jax.numpy as jnp

    from textboost_tpu.lora.partition import make_optimizer
    from textboost_tpu.models import CLIPTextModel, get_spec
    from textboost_tpu.models.pretrained import load_models
    from textboost_tpu.ops.schedule import NoiseSchedule
    from textboost_tpu.train.step import StepConfig, TextBoostTrainState, make_train_step

    spec = get_spec(preset)
    bundle = load_models(preset, lora_rank=lora_rank, dtype=jnp.bfloat16, remat=remat)

    frozen_te = CLIPTextModel(spec.text_encoder, dtype=jnp.bfloat16)
    schedule = NoiseSchedule.create(
        beta_start=spec.scheduler.beta_start,
        beta_end=spec.scheduler.beta_end,
        beta_schedule=spec.scheduler.beta_schedule,
        prediction_type=spec.scheduler.prediction_type,
    )
    null_emb = jnp.zeros((77, spec.text_encoder.hidden_size), jnp.float32)

    optimizer = make_optimizer(1e-4, 1e-3, bundle.te_params, max_grad_norm=1.0)
    config = StepConfig(
        prediction_type=spec.scheduler.prediction_type,
        vae_scaling=spec.vae.scaling_factor,
        kpl_weight=0.1,
        first_added_token_id=spec.text_encoder.vocab_size - 1,
        embedding_target_norm=0.15,
    )
    step = make_train_step(
        text_encoder_apply=bundle.text_encoder.apply,
        frozen_text_encoder_apply=frozen_te.apply,
        unet_apply=bundle.unet.apply,
        vae_encode_moments=lambda p, x: bundle.vae.apply(p, x, method="encode_moments"),
        optimizer=optimizer,
        schedule=schedule,
        config=config,
        null_embedding=null_emb,
    )
    jit_step = jax.jit(step, donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    state = TextBoostTrainState(
        step=jnp.zeros((), jnp.int32),
        te_params=bundle.te_params,
        opt_state=jax.jit(optimizer.init)(bundle.te_params),
        rng=rng,
    )
    frozen = {"unet": bundle.unet_params, "vae": bundle.vae_params,
              "te": {"params": dict(bundle.te_params["params"])}}
    # Trainable tree must not alias frozen["te"] (donation).
    state = TextBoostTrainState(
        step=state.step,
        te_params=jax.jit(lambda t: jax.tree.map(jnp.copy, t))(state.te_params),
        opt_state=state.opt_state,
        rng=state.rng,
    )

    batch_data = {
        "pixel_values": jax.random.randint(
            jax.random.PRNGKey(1), (batch, resolution, resolution, 3), 0, 256,
            dtype=jnp.int32,
        ).astype(jnp.uint8),
        "input_ids": jnp.full((batch, 77), 49407, jnp.int32).at[:, 0].set(49406),
        "prior_input_ids": jnp.full((batch, 77), 49407, jnp.int32).at[:, 0].set(49406),
    }
    return jit_step, state, batch_data, frozen


def bench_train(args):
    import jax

    cold = getattr(args, "cold", False)
    compile_log = _CompileLog()
    if cold:
        compile_log.start()
    jit_step, state, batch, frozen = build_train_bench(
        args.preset, args.batch_size, args.resolution, args.lora_rank,
        remat=args.remat,
    )
    # Warmup / compile.
    t0 = time.time()
    state, metrics = jit_step(state, batch, frozen)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.time() - t0

    for _ in range(args.warmup):
        state, metrics = jit_step(state, batch, frozen)
    jax.block_until_ready(metrics["loss"])

    def result_for(steps_per_sec, dt, iters, provisional=False):
        return {
            "metric": f"train_steps_per_sec_chip ({args.preset}, "
            f"bs={args.batch_size}, {args.resolution}px, "
            f"TE LoRA r={args.lora_rank})",
            "value": round(steps_per_sec, 4),
            "unit": "steps/s",
            "vs_baseline": round(steps_per_sec / TARGET_STEPS_PER_SEC, 4),
            "extra": {
                "compile_s": round(compile_s, 1),
                "compile_cache": "cold" if cold else "warm",
                **({"compile_breakdown": compile_log.breakdown()} if cold else {}),
                "step_ms": round(1000.0 * dt / iters, 1),
                "projected_250_steps_s": round(250.0 / steps_per_sec, 1),
                "loss_finite": bool(jax.numpy.isfinite(metrics["loss"])),
                **({"provisional": True, "window_iters": iters}
                   if provisional else {}),
            },
        }

    # First short timed window → emit a PROVISIONAL line immediately, so a
    # driver-side kill between here and the full window still leaves a real
    # measured number on stdout (VERDICT r4 #1c).
    prov_iters = min(3, args.iters)
    t0 = time.time()
    for _ in range(prov_iters):
        state, metrics = jit_step(state, batch, frozen)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    _emit(result_for(prov_iters / dt, dt, prov_iters, provisional=True),
          mode="train", kind="provisional")

    t0 = time.time()
    for _ in range(args.iters):
        state, metrics = jit_step(state, batch, frozen)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    steps_per_sec = args.iters / dt
    return result_for(steps_per_sec, dt, args.iters)


def bench_sample(args):
    import jax

    from textboost_tpu.pipelines import TextToImagePipeline

    pipe = TextToImagePipeline.from_random(args.preset)
    prompts = ["a photo of a dog"] * args.batch_size
    t0 = time.time()
    pipe(prompts, num_inference_steps=25, guidance_scale=7.5, seed=0,
         height=args.resolution, width=args.resolution)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(args.iters):
        imgs = pipe(prompts, num_inference_steps=25, guidance_scale=7.5, seed=i,
                    height=args.resolution, width=args.resolution)
    dt = time.time() - t0
    ips = args.batch_size * args.iters / dt
    return {
        "metric": f"sampling_imgs_per_sec ({args.preset}, 25 steps, "
        f"{args.resolution}px, CFG)",
        "value": round(ips, 4),
        "unit": "imgs/s",
        "vs_baseline": round(ips, 4),
        "extra": {"compile_s": round(compile_s, 1)},
    }


def bench_parts(args):
    """Component timing: VAE encode / text encode / UNet fwd / UNet
    fwd+bwd-to-hidden / full train step — isolates where the step budget
    goes (SURVEY §3.1 cost ranking)."""
    import jax
    import jax.numpy as jnp

    from textboost_tpu.models import CLIPTextModel, get_spec
    from textboost_tpu.models.pretrained import load_models

    spec = get_spec(args.preset)
    bundle = load_models(args.preset, lora_rank=args.lora_rank,
                         dtype=jnp.bfloat16, remat=args.remat)
    b, res = args.batch_size, args.resolution
    lat = res // 8

    N = 32
    # v5e chip peak: 197 TFLOP/s bf16 (394 TOPS int8).  MFU below is
    # XLA-counted FLOPs (compiled cost analysis — matmul/conv FLOPs as
    # lowered, i.e. INCLUDING any lane-padding the compiler baked in) over
    # this peak; "useful-FLOP" MFU on d=40 heads is ~3x lower by
    # construction (head dim pads 40->128, see PARITY.md).
    PEAK_TFLOPS = float(os.environ.get("TEXTBOOST_PEAK_TFLOPS", "197"))

    def _cost_flops(compiled) -> float:
        """XLA-estimated FLOPs of a compiled program (0.0 if the backend
        doesn't expose cost analysis)."""
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0))
        except Exception:
            return 0.0

    flops_of = {}

    def timeit_scan(name, body, x0, params):
        """Time one component via an in-jit lax.scan whose carry depends on
        every iteration's output.  Two axon-relay hazards: (a) the relay
        ACKs block_until_ready BEFORE real execution even for a single
        call, so the only trustworthy completion barrier is a
        device-to-host fetch of the result (np.asarray); (b) it dedupes
        bit-identical executions, so the timed call must use different
        input bits than the warmup.  The fetched value is an IN-JIT scalar
        reduction of the final carry (4 bytes): fetching the carry itself
        put its full d2h transfer on the clock — the VAE part's 25 MB f32
        pixel batch over the 1-5 MB/s tunnel inflated "VAE encode" by
        20-150 ms/iter depending on tunnel health (measured 71.9/99.3/
        132.4 ms across relay windows for the same program)."""
        import numpy as np

        def outer(c, p):
            out = jax.lax.scan(
                lambda cc, _: (body(cc, p), None), c, None, length=N)[0]
            return jnp.sum(out.astype(jnp.float32))

        fn = jax.jit(outer)
        compiled = fn.lower(x0, params).compile()
        # XLA's cost analysis counts a scan body ONCE regardless of trip
        # count (verified: flops identical at length 1/8/32, and the
        # components summed this way match the full-step program's count),
        # so the body count IS the per-iteration figure — no /N.
        flops_of[name] = _cost_flops(compiled)
        # Execute through the AOT executable: fn(...) would recompile the
        # same program via jit's dispatch cache (sub-120 s programs are
        # excluded from the persistent cache — a second full remote
        # compile per component).
        np.asarray(compiled(x0, params))  # warmup (executed + fetched)
        if jnp.issubdtype(x0.dtype, jnp.floating):
            x1 = x0 * (1.0 + 1e-3)
        else:
            # Int inputs here are token-id batches whose ROWS are all
            # identical (the text-encode ids), so a batch-axis roll would
            # reproduce the warmup bits exactly and the timed call could
            # be served by the relay's execution dedupe.  Rewrite one
            # mid-sequence position to a different valid token id instead.
            x1 = x0.at[..., 1].set(jnp.zeros_like(x0[..., 1]))
        jax.block_until_ready(x1)
        t0 = time.time()
        np.asarray(compiled(x1, params))  # d2h fetch = true completion barrier
        return (time.time() - t0) / N * 1000.0

    def mfu_fields(results):
        """Per-component achieved TFLOP/s + %-of-peak from the XLA FLOP
        counts (VERDICT r3 item 8: the structural-plateau claim as an
        auditable artifact, not prose)."""
        out = {}
        for name, ms in list(results.items()):
            comp = name[: -len("_ms")]
            fl = flops_of.get(comp, 0.0)
            if fl <= 0 or ms <= 0:
                continue
            tflops = fl / (ms / 1e3) / 1e12
            out[f"{comp}_tflops"] = round(tflops, 1)
            out[f"{comp}_mfu_pct"] = round(100.0 * tflops / PEAK_TFLOPS, 1)
        return out

    results = {}
    rng = jax.random.PRNGKey(0)
    px = jax.random.normal(rng, (b, res, res, 3), jnp.float32)

    def vae_body(c, p):
        mean, logvar = bundle.vae.apply(p, c, method="encode_moments")
        s = jnp.mean(mean.astype(jnp.float32)) + jnp.mean(
            logvar.astype(jnp.float32)
        )
        return c + s.astype(c.dtype) * 1e-3

    results["vae_encode_ms"] = timeit_scan("vae_encode", vae_body, px, bundle.vae_params)

    te = CLIPTextModel(spec.text_encoder, lora_rank=args.lora_rank,
                       dtype=jnp.bfloat16)
    ids = jnp.full((b, 77), 49407, jnp.int32).at[:, 0].set(49406)

    def te_body(c, p):
        h = te.apply(p, c)[0]
        # carry int ids perturbed by the output to serialize iterations
        return jnp.clip(
            c + (jnp.mean(h.astype(jnp.float32)) > 1e9).astype(jnp.int32),
            0, 49407,
        )

    results["text_encode_ms"] = timeit_scan("text_encode", te_body, ids, bundle.te_params)

    tsteps = jnp.full((b,), 500, jnp.int32)
    hidden = jax.random.normal(rng, (b, 77, spec.unet.cross_attention_dim),
                               jnp.bfloat16)
    noisy = jax.random.normal(rng, (b, lat, lat, 4), jnp.float32)

    def unet_body(c, p):
        return bundle.unet.apply(p, c, tsteps, hidden).astype(jnp.float32)

    results["unet_fwd_ms"] = timeit_scan("unet_fwd", unet_body, noisy, bundle.unet_params)

    def loss_h(h, p):
        return jnp.square(
            bundle.unet.apply(p, noisy, tsteps, h).astype(jnp.float32)
        ).mean()

    def unet_bwd_body(c, p):
        g = jax.grad(loss_h)(c, p)
        return c + g.astype(c.dtype) * 1e-3

    results["unet_fwd_bwd_to_hidden_ms"] = timeit_scan(
        "unet_fwd_bwd_to_hidden", unet_bwd_body, hidden, bundle.unet_params
    )

    jit_step, state, batch, frozen = build_train_bench(
        args.preset, b, res, args.lora_rank, remat=args.remat
    )
    # Lower+compile ONCE and execute through the AOT executable: reading
    # cost_analysis from a second .lower().compile() after the timing loop
    # built a whole second train-step executable (tens of seconds through
    # the relay even on a warm cache).
    try:
        compiled_step = jit_step.lower(state, batch, frozen).compile()
        flops_of["full_step"] = _cost_flops(compiled_step)
        step_fn = compiled_step
    except Exception:
        step_fn = jit_step
    state, m = step_fn(state, batch, frozen)
    float(m["loss"])  # d2h fetch: true completion barrier
    t0 = time.time()
    for _ in range(10):
        state, m = step_fn(state, batch, frozen)
    float(m["loss"])
    results["full_step_ms"] = (time.time() - t0) / 10 * 1000.0

    return {
        "metric": f"train_step_parts_ms ({args.preset}, bs={b}, {res}px)",
        "value": round(results["full_step_ms"], 1),
        "unit": "ms",
        "vs_baseline": round(
            (250.0 / 120.0) / (1000.0 / results["full_step_ms"]), 4
        ),
        "extra": {
            **{k: round(v, 1) for k, v in results.items()},
            **mfu_fields(results),
            "peak_tflops_bf16": PEAK_TFLOPS,
        },
    }


def _phase_budget(out_dir: str):
    """Parse the run's training.log + metrics.jsonl into a phase table
    (VERDICT r2 #4: budget, not extrapolation)."""
    budget = {}
    log_path = os.path.join(out_dir, "training.log")
    try:
        for line in open(log_path):
            if "setup: " in line and " at +" in line:
                what = line.split("setup: ")[1].split(" at +")[0]
                budget[f"setup_{what.replace(' ', '_')}_s"] = float(
                    line.rsplit("at +", 1)[1].rstrip("s\n")
                )
            elif "first step dispatch" in line:
                budget["first_step_dispatch_s"] = float(
                    line.rsplit(": ", 1)[1].rstrip("s\n")
                )
            elif "step AOT wait" in line:
                budget["step_aot_wait_s"] = float(
                    line.rsplit(": ", 1)[1].rstrip("s\n")
                )
            elif "step AOT: HLO fingerprint" in line:
                budget["step_hlo_fingerprint"] = line.rsplit(" ", 1)[1].strip()
            elif "Training took" in line:
                budget["loop_plus_setup_s"] = float(
                    line.split("Training took ")[1].split(" seconds")[0]
                )
    except (OSError, ValueError, IndexError):
        pass
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    try:
        last = {}
        for line in open(metrics_path):
            rec = json.loads(line)
            if "step_ms" in rec:
                last = rec
        for k in ("step_ms", "dispatch_ms", "host_wait_ms", "h2d_ms"):
            if k in last:
                budget[f"steady_{k}"] = round(last[k], 1)
    except (OSError, ValueError):
        pass
    return budget


def _time_to_first_step(budget: dict) -> float:
    """Setup + step-AOT wait + first dispatch from a _phase_budget dict —
    the 'time until the train loop is actually stepping' scalar the
    sweep2/sweepseq amortization modes report."""
    setup = max((v for k, v in budget.items()
                 if k.startswith("setup_") and isinstance(v, float)),
                default=0.0)
    return setup + budget.get("step_aot_wait_s", 0.0) + budget.get(
        "first_step_dispatch_s", 0.0)


def _run_flagship_cli(args, *, instance_token, initializer_token,
                      cache_dir=None):
    """One train_textboost.py subprocess on a synthetic instance image,
    returning wall time + artifact counts + the parsed phase budget.
    Shared by e2e (one honest flagship run) and sweep2 (two back-to-back
    runs against one fresh compile cache)."""
    import subprocess
    import tempfile

    import numpy as np
    from PIL import Image

    workdir = tempfile.mkdtemp(prefix="textboost_e2e_")
    inst = os.path.join(workdir, "instance")
    os.makedirs(inst)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    ).save(os.path.join(inst, "img.jpg"), quality=95)
    out_dir = os.path.join(workdir, "out")
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "train_textboost.py"),
        "--instance_data_dir", inst,
        # placeholder_token is what actually names the trained token
        # (instance_token defaults to it); set both so different-token
        # runs really train different tokens.
        "--placeholder_token", instance_token,
        "--instance_token", instance_token,
        "--initializer_token", initializer_token,
        "--output_dir", out_dir,
        "--model_preset", args.preset,
        "--max_train_steps", str(args.steps),
        "--train_batch_size", str(args.batch_size),
        "--resolution", str(args.resolution),
        "--lora_rank", str(args.lora_rank),
        "--augment", "pda",
        "--augment_inversion",
        "--augment_prompt", "1",
        "--template", "imagenet_small",
        "--kpl_weight", "0.1",
        # Sweep default cadence (run_textboost_db.py: total//5); compact
        # async checkpoints make this ~free even over the slow d2h tunnel.
        "--checkpointing_steps", str(args.checkpointing_steps),
        # The reference flagship trains fp16 (run_textboost_db.py:147);
        # bf16 is the TPU equivalent.  Without this the CLI defaults to
        # full fp32 — ~2x the device time and no flash attention.
        "--mixed_precision", "bf16",
    ]
    if getattr(args, "augment_device", False):
        # Device-side augmentation: per-step h2d drops from the 6.3 MB
        # pixel batch to plan scalars (VERDICT r4 #3 matched-pair evidence).
        cmd.append("--augment_device")
    if args.validation:
        # The sweep ALWAYS pays for in-training validation
        # (run_textboost_db.py:107-114: 4 prompts x num_validation_images
        # every total//5 steps) — the honest e2e includes it (VERDICT r3
        # weak #1).  --no-validation measures the bare loop for matched
        # pairs.
        cmd += [
            "--validation_steps", str(max(args.steps // 5, 1)),
            "--validation_prompts",
            "photo of a <0>",
            "a <0> in the jungle",
            "a <0> in the bucket",
            "painting of a <0> in the Monet style",
        ]
    env = dict(os.environ)
    if cache_dir is not None:
        env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    else:
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    t0 = time.time()
    # Popen (not run) so the watchdog can kill the child: os._exit from
    # the abort timer would otherwise orphan a train process that keeps
    # holding the TPU relay and the single CPU core.
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    _CHILDREN.append(proc)
    try:
        out, err = proc.communicate(timeout=3600)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, err = proc.communicate()
    finally:
        _CHILDREN.remove(proc)
    proc.stdout, proc.stderr = out, err  # uniform access below
    wall = time.time() - t0
    ok = proc.returncode == 0 and os.path.isdir(out_dir)
    n_ckpts = len(
        [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    ) if ok else 0
    n_val = len(
        [f for f in os.listdir(out_dir) if f.startswith("validation_")]
    ) if ok else 0
    ckpt_bytes = 0
    for root, _, files in os.walk(out_dir):
        if "checkpoint-" in root:
            ckpt_bytes += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
    return {
        "ok": ok,
        "wall": wall,
        "returncode": proc.returncode,
        "checkpoints_written": n_ckpts,
        "validation_grids_written": n_val,
        "checkpoint_mb_total": round(ckpt_bytes / 1e6, 1),
        "phase_budget": _phase_budget(out_dir),
        "tail": proc.stdout[-300:] if ok else (proc.stderr[-300:]),
    }


def bench_e2e(args):
    """Full flagship CLI run (BASELINE.md north star: one-shot instance,
    250 steps x bs 8, 512px, pda+inversion+KPL, under 120 s wall on
    v5e-8).  Wall time includes model build, compile (amortized by the
    persistent cache), the host data pipeline, PERIODIC checkpoints at
    the sweep default cadence (checkpointing_steps=50 — the r2 number
    quietly measured 0), in-training validation (sweep default, VERDICT
    r3 weak #1), and final export."""
    run = _run_flagship_cli(args, instance_token=args.instance_token,
                            initializer_token=args.initializer_token)
    ok, wall = run.pop("ok"), run.pop("wall")
    target = 120.0 * args.steps / 250.0
    return {
        "metric": f"e2e_cli_wall_s ({args.preset}, {args.steps} steps, "
        f"bs={args.batch_size}, {args.resolution}px, pda+inversion+KPL, "
        f"ckpt_every={args.checkpointing_steps}, "
        f"validation={'sweep' if args.validation else 'off'}"
        f"{', augment=device' if args.augment_device else ''})",
        "value": round(wall, 1) if ok else 0.0,
        "unit": "s",
        # >= 1.0 means the <120 s-per-250-steps north star is met.
        "vs_baseline": round(target / wall, 4) if ok else 0.0,
        "extra": run,
    }


def bench_sweep2(args):
    """Cross-instance compile reuse ON THE REAL CHIP (VERDICT r3 #4b):
    two back-to-back flagship runs with DIFFERENT instance/initializer
    tokens sharing one FRESH persistent compile cache.  The train step's
    lowered HLO is byte-identical across instances (data-dependent
    scalars ride `frozen`; tests/test_compile_reuse.py proves the hash),
    so instance 1 pays the cold XLA compile and instance 2 must hit the
    cache: its step-AOT wait collapses.  Because the tunneled relay keeps
    its OWN server-side compile cache (which a local fresh dir cannot
    clear), the primary on-chip identity evidence is the logged step-HLO
    fingerprint: both instances must log the SAME hash (train/aot.py).
    Reported value = instance 2's time-to-first-step; vs_baseline =
    instance1/instance2 time-to-first-step ratio (>1 when instance 2
    rides instance 1's compiles; ~1 when the relay cache was already
    warm for both — the fingerprint match still proves reuse)."""
    import shutil
    import tempfile

    cache_dir = tempfile.mkdtemp(prefix="jax_sweep2_cache_")
    # Instance 2 must actually DIFFER from instance 1 or the reuse demo is
    # vacuous (same token/initializer would trivially produce the same
    # program regardless of the design).
    tok2 = "<sweep2b>" if args.instance_token != "<sweep2b>" else "<sweep2c>"
    init2 = "cat" if args.initializer_token != "cat" else "dog"
    runs = []
    try:
        for tok, init in ((args.instance_token, args.initializer_token),
                          (tok2, init2)):
            runs.append(_run_flagship_cli(args, instance_token=tok,
                                          initializer_token=init,
                                          cache_dir=cache_dir))
            if not runs[-1]["ok"]:
                # Instance 2 exists only to demonstrate riding instance 1's
                # compiles — after a failed instance 1 it can't produce a
                # valid ratio, so don't burn another full flagship run.
                break
    finally:
        # The fresh cache holds the serialized train-step executables
        # (hundreds of MB); repeated sweep2 runs must not accumulate them.
        shutil.rmtree(cache_dir, ignore_errors=True)
    ok = len(runs) == 2 and all(r["ok"] for r in runs)

    def _ttfs(run):
        return _time_to_first_step(run["phase_budget"])

    if not ok:
        return {
            "metric": "sweep2_instance2_time_to_first_step_s "
            f"({args.preset}, {args.steps} steps, fresh shared compile cache)",
            "value": 0.0,
            "unit": "s",
            "vs_baseline": 0.0,
            "extra": {
                "error": "flagship instance failed",
                "runs": [
                    {"ok": r["ok"], "wall_s": round(r["wall"], 1),
                     "phase_budget": r["phase_budget"], "tail": r["tail"]}
                    for r in runs
                ],
            },
        }

    fp1 = runs[0]["phase_budget"].get("step_hlo_fingerprint")
    fp2 = runs[1]["phase_budget"].get("step_hlo_fingerprint")
    ttfs1, ttfs2 = _ttfs(runs[0]), _ttfs(runs[1])
    return {
        "metric": "sweep2_instance2_time_to_first_step_s "
        f"({args.preset}, {args.steps} steps, fresh shared compile cache)",
        "value": round(ttfs2, 1),
        "unit": "s",
        # Ratio is meaningless when log parsing yielded no phases — report
        # 0.0 rather than dividing by the floor and inflating it.
        "vs_baseline": round(ttfs1 / ttfs2, 2) if ttfs1 > 0 and ttfs2 > 0
        else 0.0,
        "extra": {
            "step_hlo_fingerprints_match": bool(fp1 and fp1 == fp2),
            "step_hlo_fingerprint": fp1,
            "instance1": {"wall_s": round(runs[0]["wall"], 1),
                          "time_to_first_step_s": round(ttfs1, 1),
                          "phase_budget": runs[0]["phase_budget"]},
            "instance2": {"wall_s": round(runs[1]["wall"], 1),
                          "time_to_first_step_s": round(ttfs2, 1),
                          "phase_budget": runs[1]["phase_budget"]},
            "tail": runs[1]["tail"],
        },
    }


def bench_sweepseq(args):
    """In-process sequential sweep amortization ON THE REAL CHIP: ONE
    `run_textboost_db.py --sequential` process trains TWO instances; the
    process-level executable/bundle memos (train/aot._AOT_MEMO,
    models/pretrained._PRESET_MEMO) must collapse instance 2's setup to
    seconds — the sweep-throughput claim behind the ~1 h projected
    30-instance sd15 sweep.  Reported value = instance 2's
    time-to-first-step; vs_baseline = instance1/instance2 ratio."""
    import subprocess
    import tempfile

    import numpy as np
    from PIL import Image

    workdir = tempfile.mkdtemp(prefix="textboost_sweepseq_")
    data = os.path.join(workdir, "data")
    rng = np.random.default_rng(0)
    names = ("dog", "cat")
    for name in names:
        d = os.path.join(data, name)
        os.makedirs(d)
        Image.fromarray(
            rng.integers(0, 255, (args.resolution, args.resolution, 3),
                         dtype=np.uint8)
        ).save(os.path.join(d, "img.jpg"), quality=95)
    outdir = os.path.join(workdir, "out")
    cmd = [
        sys.executable,
        os.path.join(_REPO_ROOT, "run_textboost_db.py"),
        "--model", args.preset, "--instances", *names, "--sequential",
        "--data-dir", data, "--outdir", outdir,
        "--total-steps", str(args.steps),
        "--batch-size", str(args.batch_size),
        "--lora-rank", str(args.lora_rank),
        "--validation-steps", "0",
    ]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    t0 = time.time()
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    _CHILDREN.append(proc)
    try:
        out, err = proc.communicate(timeout=7200)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, err = proc.communicate()
    finally:
        _CHILDREN.remove(proc)
    wall = time.time() - t0

    budgets = {n: _phase_budget(os.path.join(outdir, n)) for n in names}

    def _log_start(name):
        # Training order derived from the artifacts, not assumed from the
        # runner's INSTANCES-list order: first timestamped line of each
        # run's training.log.
        try:
            for line in open(os.path.join(outdir, name, "training.log")):
                return line[:23]
        except OSError:
            pass
        return "9999"

    first, second = sorted(names, key=_log_start)
    ttfs1 = _time_to_first_step(budgets[first])
    ttfs2 = _time_to_first_step(budgets[second])
    ok = proc.returncode == 0 and ttfs2 > 0
    return {
        "metric": "sweepseq_instance2_time_to_first_step_s "
        f"({args.preset}, {args.steps} steps x2 instances, one process)",
        "value": round(ttfs2, 1) if ok else 0.0,
        "unit": "s",
        "vs_baseline": round(ttfs1 / ttfs2, 2) if ok and ttfs2 else 0.0,
        "extra": {
            "returncode": proc.returncode,
            "sweep_wall_s": round(wall, 1),
            "instance1": {"name": first, "phase_budget": budgets[first]},
            "instance2": {"name": second, "phase_budget": budgets[second]},
            # None when either run logged no fingerprint (e.g. the CPU
            # smoke path, where the step AOT is gated off).
            "fingerprints_match": (
                budgets[first]["step_hlo_fingerprint"]
                == budgets[second]["step_hlo_fingerprint"]
                if "step_hlo_fingerprint" in budgets[first]
                and "step_hlo_fingerprint" in budgets[second]
                else None
            ),
            "tail": (out or err)[-300:],
        },
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode",
                        choices=["train", "sample", "e2e", "parts", "sweep2",
                                 "sweepseq"],
                        default="train")
    parser.add_argument("--steps", type=int, default=250,
                        help="e2e mode: train steps")
    parser.add_argument("--checkpointing-steps", type=int, default=50,
                        help="e2e mode: periodic checkpoint cadence "
                        "(sweep default total//5; 0 disables)")
    parser.add_argument("--validation", dest="validation", action="store_true",
                        default=True,
                        help="e2e mode: include the sweep's in-training "
                        "validation rounds (4 prompts every total//5 steps "
                        "— the cost the real sweep always pays)")
    parser.add_argument("--no-validation", dest="validation",
                        action="store_false")
    parser.add_argument("--augment-device", dest="augment_device",
                        action="store_true",
                        help="e2e mode: run the flagship with device-side "
                        "augmentation (pixels resident, h2d = plan bytes)")
    # Different instance/initializer tokens lower to byte-identical HLO
    # (data-dependent scalars ride `frozen`), so back-to-back e2e runs
    # with different tokens demonstrate cross-instance compile reuse on
    # the real chip (VERDICT r3 #4b).
    parser.add_argument("--instance-token", default="<x>",
                        help="e2e mode: placeholder token for the run")
    parser.add_argument("--initializer-token", default="dog",
                        help="e2e mode: initializer word for the run")
    parser.add_argument("--preset", default="sd15")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--lora-rank", type=int, default=4)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    # bs8/512px fits v5e HBM without remat (measured: 3.95 vs 3.27 steps/s);
    # pass --remat for larger batches.
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--cold", action="store_true",
                        help="measure a COLD compile: point the persistent "
                        "cache at a throwaway dir so nothing is reused")
    args = parser.parse_args()

    # ---- un-losable artifact protocol (VERDICT r4 #1) -------------------
    # 1. BEFORE touching jax or the relay, print a placeholder line carrying
    #    the last-known-good number: if the DRIVER's own timeout kills this
    #    process at any later point, stdout already holds a parseable result.
    lkg = _last_known_good(args.mode)
    _emit(_degraded_result(
        args.mode, "bench killed before any measurement completed "
        "(placeholder printed at startup; later lines supersede this)", lkg,
        extra={"phase": "startup"}), mode=args.mode, kind="startup")

    # 2. Health-probe the relay from a SUBPROCESS under a hard timeout —
    #    client init itself has been observed to block >10 min (r3).  On
    #    failure, report degraded + last-known-good instead of hanging.
    probe_s = int(os.environ.get("TEXTBOOST_BENCH_PROBE_S", "300"))
    probe = None
    if probe_s > 0 and not os.environ.get("TEXTBOOST_BENCH_SELFTEST_HANG"):
        probe = _health_probe(probe_s)
        if not probe["ok"]:
            _emit(_degraded_result(
                args.mode, f"relay health probe failed: {probe['detail']}",
                lkg, extra={"phase": "probe", "probe_s": probe["seconds"]}),
                mode=args.mode)
            return 0 if (lkg and lkg["result"].get("value", 0) > 0) else 1

    if args.cold:
        import tempfile

        os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix="jax_cold_cache_"
        )
    if not os.environ.get("TEXTBOOST_BENCH_SELFTEST_HANG"):
        _platform_override()

    # 3. Watchdog: kill-and-report well BEFORE any plausible driver budget
    #    (r4's 2700 s default outlived the driver's timeout and the round's
    #    artifact came back empty).  Tunable via TEXTBOOST_BENCH_WATCHDOG_S
    #    (0 disables).  e2e/sweep2 are builder-run modes with longer
    #    child-process budgets of their own.
    default_wd = {"e2e": "3900", "sweep2": "7800", "sweepseq": "7800",
                  "parts": "2400"}.get(args.mode, "1200")
    watchdog_s = int(os.environ.get("TEXTBOOST_BENCH_WATCHDOG_S", default_wd))
    if watchdog_s > 0:
        import threading

        def _abort():
            for p in list(_CHILDREN):  # don't orphan the e2e train child
                try:
                    p.kill()
                except Exception:
                    pass
            # Re-scan: a mid-run provisional sidecar from THIS run is the
            # freshest number available and beats any prior round's.
            now_lkg = _last_known_good(args.mode)
            result = _degraded_result(
                args.mode, f"watchdog: no result after {watchdog_s}s "
                "(TPU relay unresponsive?)", now_lkg,
                extra={"phase": "watchdog",
                       **({"probe": probe} if probe else {})})
            _emit(result, mode=args.mode)
            os._exit(0 if result.get("value", 0) > 0 else 3)

        timer = threading.Timer(watchdog_s, _abort)
        timer.daemon = True
        timer.start()

    if os.environ.get("TEXTBOOST_BENCH_SELFTEST_HANG"):
        # Test hook (tests/test_bench_emission.py): simulate a hung backend
        # without touching jax so the watchdog emission path is exercised.
        while True:
            time.sleep(1)

    try:
        result = {"train": bench_train, "sample": bench_sample,
                  "e2e": bench_e2e, "parts": bench_parts,
                  "sweep2": bench_sweep2,
                  "sweepseq": bench_sweepseq}[args.mode](args)
        if probe:
            result.setdefault("extra", {})["probe"] = probe
    except Exception as e:  # noqa: BLE001 — bench must always emit one line
        result = _degraded_result(
            args.mode, f"{type(e).__name__}: {e}", _last_known_good(args.mode),
            extra={"phase": "exception"})
    _emit(result, mode=args.mode)
    return 0 if result.get("value", 0) > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
