"""Instance-parallel sweep launching.

The reference's sweep runners launch one torchrun job at a time, each
spanning every accelerator (/root/reference/run_textboost_db.py:106-162).
On TPU the efficient sweep shape is the transpose: ONE chip per instance,
N instances concurrently — a one-shot TextBoost instance fits a single
v5e chip with HBM headroom (bs8/512px, no remat), per-job collectives
disappear, and sweep throughput scales linearly in chips.  A v5e-8 host
clears the 30-instance DreamBooth benchmark in ceil(30/8) = 4 waves.

Each wave member is a subprocess pinned to a disjoint chip via
`utils.platform.single_chip_env`; stdout/stderr go to the run dir's
`train_stdout.log` so concurrent jobs don't interleave on the console.
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import Callable, List, Sequence, Tuple

from .platform import single_chip_env


def launch_waves(
    jobs: Sequence[Tuple[str, List[str]]],
    parallel: int,
    script: str,
    outdir: str,
    archive: Callable[[str, List[str]], None],
    dry_run: bool = False,
) -> int:
    """Run (name, cmd) training jobs in waves of `parallel` one-chip
    subprocesses.  Returns the number of jobs that exited nonzero."""
    failed = 0
    for i in range(0, len(jobs), parallel):
        procs = []
        for slot, (name, cmd) in enumerate(jobs[i:i + parallel]):
            print(f"=== {name}: train_textboost.py {' '.join(cmd)}")
            if dry_run:
                continue
            run_dir = os.path.join(outdir, name)
            os.makedirs(run_dir, exist_ok=True)
            log = open(os.path.join(run_dir, "train_stdout.log"), "w")
            proc = subprocess.Popen(
                [sys.executable, script] + cmd,
                stdout=log,
                stderr=subprocess.STDOUT,
                env=single_chip_env(slot),
            )
            procs.append((proc, log, name, cmd))
        for proc, log, name, cmd in procs:
            code = proc.wait()
            log.close()
            if code != 0:
                failed += 1
                print(
                    f"!!! {name} exited {code} "
                    f"(see {os.path.join(outdir, name, 'train_stdout.log')})"
                )
            archive(name, cmd)
    return failed


def run_job(cmd: List[str], script: str, *, sequential: bool) -> None:
    """Run ONE training job — shared by both sweep runners' non-wave paths.

    sequential=True runs in-process (train_textboost.main parses the
    explicit argv list; sys.argv is never touched), sharing this process's
    TPU client, first-sync tax, and jit caches across instances;
    sequential=False isolates each instance in a subprocess like the
    reference's per-instance torchrun (run_textboost_db.py:106-111)."""
    if sequential:
        import train_textboost

        train_textboost.main(cmd)
    else:
        subprocess.run([sys.executable, script] + cmd, check=False)
