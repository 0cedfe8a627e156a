#!/usr/bin/env python
"""One-command paper-protocol run: train -> generate -> score -> metric CSV.

The reference's de-facto acceptance test is the scored DreamBooth benchmark
(/root/reference/eval_dreambooth.py:568-628): train per instance
(run_textboost_db.py), generate 25 prompts x seeds per instance, score
CLIP-T / CLIP-I / DINO / VQA, and emit `metric_last.csv`.  This driver runs
that WHOLE chain with one command — at paper scale against real data +
converted scorer weights, or as an offline rehearsal (--synthetic-data
--allow-random-scorers) that exercises every stage end-to-end at the tiny
preset and asserts the CSV layout column-for-column against the reference
schema (VERDICT r4 #2/#5).

Rehearsal (offline, ~10 min on the 1-core CPU host):
  python tools/paper_protocol.py --model tiny --synthetic-data \
      --instances dog cat clock --total-steps 10 --batch-size 2 \
      --gen-steps 2 --seeds 0 --allow-random-scorers --workdir /tmp/pp

Paper scale (v5e, real DreamBooth data + converted weights):
  python tools/paper_protocol.py --model sd15 \
      --data-dir data/dreambooth_n1_train --val-dir data/dreambooth_n1_val \
      --scorer-weights scorer_weights --vqa-weights scorer_weights/vqa
"""
import argparse
import csv
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="sd15")
    p.add_argument("--instances", nargs="+", default=["dog", "cat", "clock"])
    p.add_argument("--total-steps", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-samples", type=int, default=1)
    p.add_argument("--parallel", type=int, default=1)
    p.add_argument("--lora-rank", type=int, default=4)
    p.add_argument("--validation-steps", type=int, default=None,
                   help="override the sweep's total//5 cadence (0 disables)")
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    p.add_argument("--gen-steps", type=int, default=25)
    p.add_argument("--gen-batch-size", type=int, default=16)
    p.add_argument("--data-dir", default=None,
                   help="instance image root (<dir>/<instance>/*.jpg)")
    p.add_argument("--val-dir", default=None,
                   help="unseen reference images for clip_i_unseen/dino_unseen")
    p.add_argument("--synthetic-data", action="store_true",
                   help="generate random instance/val images (rehearsal)")
    p.add_argument("--scorer-weights", default=None)
    p.add_argument("--vqa-weights", default=None)
    p.add_argument("--allow-random-scorers", action="store_true")
    p.add_argument("--workdir", default="paper_protocol_run")
    p.add_argument("--skip-train", action="store_true",
                   help="reuse <workdir>/models from a previous run")
    return p.parse_args()


def _run(cmd, name):
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        raise SystemExit(f"{name} failed (rc={proc.returncode})")
    return time.time() - t0


def make_synthetic_data(args):
    import numpy as np
    from PIL import Image

    from textboost_tpu.models.configs import get_spec

    res = get_spec(args.model).resolution
    data_dir = os.path.join(args.workdir, "data")
    val_dir = os.path.join(args.workdir, "val")
    for i, name in enumerate(args.instances):
        for root, seed in ((data_dir, i), (val_dir, 1000 + i)):
            d = os.path.join(root, name)
            os.makedirs(d, exist_ok=True)
            rng = np.random.RandomState(seed)
            Image.fromarray(
                rng.randint(0, 255, (res, res, 3), dtype=np.uint8)
            ).save(os.path.join(d, "0.jpg"), quality=95)
    return data_dir, val_dir


def validate_csv(csv_path, seeds):
    """Column-for-column schema parity with the reference's metric CSV
    (/root/reference/eval_dreambooth.py:577-628)."""
    from eval_dreambooth import REFERENCE_CSV_HEADER

    with open(csv_path, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == REFERENCE_CSV_HEADER, (
        f"header mismatch:\n got {rows[0]}\nwant {REFERENCE_CSV_HEADER}")
    body = rows[1:]
    assert [r[0] for r in body] == [str(s) for s in seeds], body
    for r in body:
        assert len(r) == len(REFERENCE_CSV_HEADER), r
        for cell in r[1:]:
            float(cell)  # every metric cell is numeric
            assert len(cell.split(".")[-1]) == 3, (
                f"reference uses %.3f formatting, got {cell!r}")
    return body


def main():
    args = parse_args()
    sys.path.insert(0, REPO)
    os.makedirs(args.workdir, exist_ok=True)
    models_dir = os.path.abspath(os.path.join(args.workdir, "models"))
    bench_dir = os.path.abspath(os.path.join(args.workdir, "benchmarks"))

    if args.synthetic_data:
        data_dir, val_dir = make_synthetic_data(args)
    else:
        if not args.data_dir:
            raise SystemExit("pass --data-dir or --synthetic-data")
        data_dir, val_dir = args.data_dir, args.val_dir or args.data_dir
    data_dir, val_dir = os.path.abspath(data_dir), os.path.abspath(val_dir)

    timings = {}
    if not args.skip_train:
        cmd = [
            sys.executable, os.path.join(REPO, "run_textboost_db.py"),
            "-m", args.model, "--instances", *args.instances,
            "--total-steps", str(args.total_steps),
            "--batch-size", str(args.batch_size),
            "--num-samples", str(args.num_samples),
            "--lora-rank", str(args.lora_rank),
            "--data-dir", data_dir, "--outdir", models_dir,
            "--parallel", str(args.parallel),
        ]
        if args.validation_steps is not None:
            cmd += ["--validation-steps", str(args.validation_steps)]
        timings["train_s"] = _run(cmd, "train sweep")

    missing = [i for i in args.instances
               if not os.path.isdir(os.path.join(models_dir, i))]
    if missing:
        raise SystemExit(f"trained model dirs missing: {missing}")

    cmd = [
        sys.executable, os.path.join(REPO, "eval_dreambooth.py"), models_dir,
        "--model", args.model, "--instances", *args.instances,
        "--seeds", *map(str, args.seeds),
        "--steps", str(args.gen_steps),
        "--batch-size", str(args.gen_batch_size),
        "--lora-rank", str(args.lora_rank),
        "--outdir", bench_dir,
        "--train-dir", data_dir, "--val-dir", val_dir,
        "--metric", "clip-t", "clip-i", "dino", "vqa",
    ]
    if args.scorer_weights:
        cmd += ["--scorer-weights", args.scorer_weights]
    if args.vqa_weights:
        cmd += ["--vqa-weights", args.vqa_weights]
    if args.allow_random_scorers:
        cmd += ["--allow-random-scorers"]
    timings["eval_s"] = _run(cmd, "generation + metrics")

    csv_path = os.path.join(models_dir, "metric_last.csv")
    body = validate_csv(csv_path, args.seeds)
    n_images = sum(
        len(files)
        for _, _, files in os.walk(bench_dir)
        if files
    )
    summary = {
        "csv": csv_path,
        "csv_schema": "reference-parity",
        "rows": body,
        "generated_images": n_images,
        **{k: round(v, 1) for k, v in timings.items()},
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
