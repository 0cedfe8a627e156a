"""Worker for tests/test_multihost.py: one JAX process of a 2-process CPU
job running the real Trainer over a global mesh.

Usage: python multihost_worker.py <process_id> <port> <instance_dir> <out_dir>
           [max_steps] [checkpointing_steps] [resume(0|1)]
"""
import os
import sys


def main():
    pid, port, instance_dir, out_dir = sys.argv[1:5]
    max_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    ckpt_steps = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    resume = len(sys.argv) > 7 and sys.argv[7] == "1"
    kept = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    os.environ["XLA_FLAGS"] = " ".join(
        ["--xla_force_host_platform_device_count=4"] + kept
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
    )
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=int(pid)
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from textboost_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        model_preset="tiny",
        instance_data_dir=instance_dir,
        placeholder_token="<dog>",
        instance_token="<dog>",
        initializer_token="dog",
        output_dir=out_dir,
        resolution=128,
        train_batch_size=8,  # global; 4 per process
        max_train_steps=max_steps,
        checkpointing_steps=ckpt_steps,
        resume_from_checkpoint="latest" if resume else None,
        validation_steps=0,
        lora_rank=4,
        template="textboost",
        seed=0,
        dataloader_num_workers=1,
        mixed_precision="no",
        human_prompts_path=None,
    ).validate()
    trainer = Trainer(cfg)
    assert trainer.local_batch_size == 4
    assert trainer.mesh.devices.size == 8
    if resume:
        assert trainer.start_step > 0, "resume did not restore a checkpoint"
        print(f"MULTIHOST_RESUMED pid={pid} from_step={trainer.start_step}",
              flush=True)
    result = trainer.train()
    import numpy as np

    assert result["steps"] == max_steps
    assert np.isfinite(result["loss"])
    print(f"MULTIHOST_OK pid={pid} loss={result['loss']:.4f}", flush=True)


if __name__ == "__main__":
    main()
