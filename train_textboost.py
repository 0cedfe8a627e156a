#!/usr/bin/env python
"""TextBoost-TPU training entry point.

CLI-parity counterpart of /root/reference/train_textboost.py: fine-tunes
the CLIP text encoder (LoRA + placeholder-token embeddings) against a
frozen SD UNet/VAE denoising loss with augmentation tokens and the
knowledge-preservation loss, as one jitted GSPMD train step.

Example (offline, random-init tiny model):
  python train_textboost.py --model_preset tiny \
      --instance_data_dir /path/imgs --placeholder_token "<dog>" \
      --initializer_token dog --max_train_steps 250 --train_batch_size 8 \
      --augment pda --augment_inversion --lora_rank 4
"""
import os

# TPU runtime knobs must land before JAX backend init.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def _platform_override():
    from textboost_tpu.utils.platform import (
        apply_platform_override,
        start_device_warmup,
    )

    apply_platform_override()
    # Overlaps the relay's per-process first-sync tax with setup compiles.
    start_device_warmup()



def main(argv=None):
    _platform_override()
    # Multi-host pods: every host runs this same entry; JAX coordinates via
    # the cluster environment (the torchrun/c10d counterpart —
    # run_textboost_db.py:106-111 in the reference).
    if os.environ.get("TEXTBOOST_MULTIHOST") == "1":
        import jax

        jax.distributed.initialize()

    from textboost_tpu.train import Trainer, parse_args

    config = parse_args(argv)
    trainer = Trainer(config)
    return trainer.train()


if __name__ == "__main__":
    main()
