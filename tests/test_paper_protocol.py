"""One-command paper-protocol rehearsal (VERDICT r4 #5).

Runs tools/paper_protocol.py end-to-end at tiny scale: run_textboost_db.py
trains 3 instances, eval_dreambooth.py generates 25 prompts/seed/instance
and scores ALL FOUR metrics (random-scorer flag), and the emitted
metric_last.csv matches the reference's layout column for column
(/root/reference/eval_dreambooth.py:577-628).
"""
import csv
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The reference's exact header: ["seed"] + score_dict key order.
REFERENCE_HEADER = [
    "seed", "clip_score", "vqa_score", "clip_i", "clip_i_unseen",
    "dino", "dino_unseen",
]


def test_paper_protocol_one_command(tmp_path):
    env = dict(os.environ, TEXTBOOST_PLATFORM="cpu")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "paper_protocol.py"),
            "--model", "tiny", "--synthetic-data",
            "--instances", "dog", "cat", "clock",
            "--total-steps", "4", "--batch-size", "2",
            "--validation-steps", "0",
            "--gen-steps", "2", "--gen-batch-size", "8",
            "--seeds", "0",
            "--allow-random-scorers",
            "--workdir", str(tmp_path / "pp"),
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["csv_schema"] == "reference-parity"
    # 3 instances x 1 seed x 25 prompts
    assert summary["generated_images"] == 75

    with open(summary["csv"], newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == REFERENCE_HEADER
    assert len(rows) == 2  # header + one seed
    body = rows[1]
    assert body[0] == "0"
    for name, cell in zip(REFERENCE_HEADER[1:], body[1:]):
        val = float(cell)
        assert len(cell.split(".")[-1]) == 3, (name, cell)
        # All four metric families actually ran: with random scorers the
        # scores are self-consistent but none of the selected columns may
        # remain at their 0.0 initialization.
        assert val != 0.0, f"metric {name} never ran"
