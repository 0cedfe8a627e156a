#!/usr/bin/env python3
"""DreamBooth 30-instance sweep runner.

Counterpart of /root/reference/run_textboost_db.py: per instance, compose
and launch a training job with the paper's defaults (250 steps, bs 8,
LoRA r=4, imagenet_small templates, paug + inversion), archiving the exact
command and a snapshot of the training script per run.

TPU-native launch model: no torchrun/c10d rendezvous — each job is a
single-process JAX program that data-parallelizes over the local chips via
the mesh (multi-host pods launch this same script per host with
jax.distributed).  Use --sequential to reuse one process; default spawns a
subprocess per instance like the reference.
"""
import argparse
import os
import shutil

# (subject_name, class, initializer token prefix) — run_textboost_db.py:8-39.
INSTANCES = [
    ("backpack", "backpack", "red"),
    ("backpack_dog", "backpack", "character"),
    ("bear_plushie", "stuffed animal", "bear"),
    ("berry_bowl", "bowl", "white"),
    ("can", "can", "beer"),
    ("candle", "candle", "jar"),
    ("cat", "cat", "orange"),
    ("cat2", "cat", "gray"),
    ("clock", "clock", "yellow"),
    ("colorful_sneaker", "sneaker", "color"),
    ("dog", "dog", "corgi"),
    ("dog2", "dog", "fluffy"),
    ("dog3", "dog", "poodle"),
    ("dog5", "dog", "dachshund"),
    ("dog6", "dog", "corgi"),
    ("dog7", "dog", "retriever"),
    ("dog8", "dog", "border collie"),
    ("duck_toy", "toy", "rubber"),
    ("fancy_boot", "boot", "fringe"),
    ("grey_sloth_plushie", "stuffed animal", "sloth"),
    ("monster_toy", "toy", "stuffed"),
    ("pink_sunglasses", "glasses", "pink"),
    ("poop_emoji", "toy", "poop"),
    ("rc_car", "toy", "car"),
    ("red_cartoon", "cartoon", "devil"),
    ("robot_toy", "toy", "robot"),
    ("shiny_sneaker", "sneaker", "rainbow"),
    ("teapot", "teapot", "brown"),
    ("vase", "vase", "red"),
    ("wolf_plushie", "stuffed animal", "dog"),
]

RESOLUTION = {"sd14": 512, "sd15": 512, "sd21base": 512, "sd21": 768, "tiny": 128}


def parse_args():
    parser = argparse.ArgumentParser(description="Run TextBoost experiment")
    # Reference-CLI compatibility: -g/--gpu selected CUDA devices for
    # torchrun (run_textboost_db.py:43); device selection here is the
    # JAX mesh (--mesh-tp / all local chips), so the flag is accepted
    # and ignored for drop-in command-line parity.
    parser.add_argument("-g", "--gpu", type=str, default=None,
                        help="ignored (reference compatibility)")
    parser.add_argument("-n", "--num-samples", type=int, default=1)
    parser.add_argument("-m", "--model", type=str, default="sd21base")
    parser.add_argument("--instances", type=str, nargs="+", default=None)
    parser.add_argument("--lora-rank", type=int, default=4)
    parser.add_argument("--total-steps", type=int, default=250)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--emb-lr", type=float, default=1e-3)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--train-params", type=str, default="none")
    parser.add_argument("--augment", type=str, default="pda")
    parser.add_argument("--augment-p", type=float, default=0.5)
    parser.add_argument("--null-prob", type=float, default=0.1)
    parser.add_argument("--kpl-weight", type=float, default=0.1)
    parser.add_argument("--no-weighted-sample", action="store_true", default=False)
    parser.add_argument("--no-inversion", action="store_true", default=False)
    parser.add_argument("--mixing", action="store_true", default=False)
    parser.add_argument("--desc", type=str, default=None)
    parser.add_argument("--data-dir", type=str, default="datasets/dreambooth_n1_train")
    parser.add_argument("--mesh-tp", type=int, default=1)
    parser.add_argument("--sequential", action="store_true",
                        help="run in-process instead of one subprocess per instance")
    parser.add_argument("--parallel", type=int, default=1,
                        help="run N instances concurrently, each subprocess "
                        "pinned to a disjoint single TPU chip (a v5e-8 host "
                        "clears the 30-instance sweep in 4 waves of 8 "
                        "one-chip jobs instead of 30 sequential runs)")
    parser.add_argument("--dry-run", action="store_true")
    # TPU extras (absent in the reference runner): place the sweep outside
    # ./output and override the hardcoded total//5 validation cadence —
    # used by tools/paper_protocol.py to rehearse the full protocol at toy
    # scale without paying 5 validation rounds per instance.
    parser.add_argument("--outdir", type=str, default=None,
                        help="sweep output dir (default output/tb-<model>-<n>)")
    parser.add_argument("--validation-steps", type=int, default=None,
                        help="override validation cadence (default "
                        "total_steps//5; 0 disables)")
    return parser.parse_args()


def build_cmd(args, name, cls, init_token, outdir):
    model = args.model.lower().replace("-", "").replace(".", "")
    resolution = RESOLUTION.get(model, 512)
    init_token = f"{init_token} {cls}"
    identifier = "<0>"
    val_steps = (
        args.validation_steps
        if getattr(args, "validation_steps", None) is not None
        else args.total_steps // 5
    )
    cmd = [
        f"--model_preset={model}",
        f"--instance_data_dir={os.path.join(args.data_dir, name)}",
        # os.path.join keeps absolute --outdir paths absolute.
        f"--output_dir={os.path.join(outdir, name)}",
        f"--class_token={cls}",
        f"--instance_token={identifier}",
        f"--validation_steps={val_steps}",
        f"--placeholder_token=<{name}>",
        f"--initializer_token={init_token}",
        "--validation_prompts",
        f"photo of a {identifier}",
        f"a {identifier} in the jungle",
        f"a {identifier} in the bucket",
        f"painting of a {identifier} in the Monet style",
        f"--resolution={resolution}",
        f"--lora_rank={args.lora_rank}",
        f"--learning_rate={args.lr}",
        f"--emb_learning_rate={args.emb_lr}",
        f"--train_batch_size={args.batch_size}",
        f"--max_train_steps={args.total_steps}",
        f"--checkpointing_steps={args.total_steps // 5}",
        "--gradient_accumulation_steps=1",
        f"--unet_params_to_train={args.train_params}",
        f"--augment={args.augment}",
        f"--augment_p={args.augment_p}",
        f"--null_prob={args.null_prob}",
        f"--kpl_weight={args.kpl_weight}",
        "--template=imagenet_small",
        "--mixed_precision=bf16",
        f"--mesh_tp={args.mesh_tp}",
    ]
    if args.num_samples is not None:
        cmd.append(f"--num_samples={args.num_samples}")
    if not args.no_inversion:
        cmd.append("--augment_inversion")
    if args.no_weighted_sample:
        cmd.append("--disable_weighted_sample")
    if args.augment == "none":
        cmd.append("--center_crop")
    if args.mixing:
        cmd.append("--mixing")
    return cmd


def main(args):
    if args.instances is not None:
        instances = [t for t in INSTANCES if t[0] in args.instances]
    else:
        instances = INSTANCES

    num_str = "all" if args.num_samples is None else f"n{args.num_samples}"
    if getattr(args, "outdir", None):
        outdir = args.outdir
    else:
        outdir = f"output/tb-{args.model}-{num_str}"
        if args.desc is not None:
            outdir += f"-{args.desc}"
    os.makedirs(outdir, exist_ok=True)

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "train_textboost.py")

    def archive(name, cmd):
        # Archive the command + training-script snapshot (:164-168).
        run_dir = os.path.join(outdir, name)
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "cmd.txt"), "w") as f:
            f.write("\n".join(["train_textboost.py"] + cmd))
        shutil.copy(script, os.path.join(run_dir, "train_textboost.py"))

    if getattr(args, "parallel", 1) > 1 and not args.sequential:
        # Instance-parallel waves: N concurrent one-chip subprocesses —
        # the TPU-native transpose of the reference's one-torchrun-at-a-
        # time launch model (utils/sweep.py for the rationale).
        from textboost_tpu.utils.sweep import launch_waves

        jobs = [
            (name, build_cmd(args, name, cls, init_token, outdir))
            for name, cls, init_token in instances
        ]
        launch_waves(
            jobs, args.parallel, script, outdir, archive, dry_run=args.dry_run
        )
        return

    from textboost_tpu.utils.sweep import run_job

    for name, cls, init_token in instances:
        cmd = build_cmd(args, name, cls, init_token, outdir)
        print(f"=== {name}: train_textboost.py {' '.join(cmd)}")
        if args.dry_run:
            continue
        run_job(cmd, script, sequential=args.sequential)
        archive(name, cmd)


if __name__ == "__main__":
    main(parse_args())
