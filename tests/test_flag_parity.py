"""CLI flag-surface parity vs the reference repo (gated on its presence).

Every long flag the reference's argparse defines must be accepted by the
corresponding CLI here (same-named or aliased), so reference users'
command lines run unmodified.  Extraction is textual ("--name" string
literals), which covers argparse's add_argument calls.
"""
import os
import re

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

# (reference file, repo file that must accept its flags)
PAIRS = [
    ("train_textboost.py", "textboost_tpu/train/config.py"),
    ("inference.py", "inference.py"),
    ("eval_dreambooth.py", "eval_dreambooth.py"),
    ("run_textboost_db.py", "run_textboost_db.py"),
    ("run_textboost_sdrp.py", "run_textboost_sdrp.py"),
]


def _flags(path: str):
    text = open(path).read()
    return sorted(set(re.findall(r'"--([a-z_0-9-]+)"', text)))


@pytest.mark.parametrize("ref_file,repo_file", PAIRS)
def test_every_reference_flag_is_accepted(ref_file, repo_file):
    ref_text_flags = _flags(os.path.join(REF, ref_file))
    repo_text = open(os.path.join(REPO, repo_file)).read()
    missing = [
        f for f in ref_text_flags
        # accept either dash or underscore spelling in the repo source
        if f not in repo_text and f.replace("-", "_") not in repo_text
    ]
    assert not missing, f"{repo_file} missing reference flags: {missing}"
