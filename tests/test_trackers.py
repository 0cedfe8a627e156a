"""Tracker abstraction: tensorboard / wandb / comet_ml parity
(train_textboost.py:267-274,941-945)."""
import sys
import types

import numpy as np


def _fake_wandb(calls):
    mod = types.ModuleType("wandb")

    class Run:
        def log(self, data, step=None):
            calls.append(("log", data, step))

        def finish(self):
            calls.append(("finish",))

    def init(**kwargs):
        calls.append(("init", kwargs))
        return Run()

    class Image:
        def __init__(self, img, caption=None):
            calls.append(("image", np.shape(img), caption))

    mod.init = init
    mod.Image = Image
    return mod


def test_wandb_backend(monkeypatch, tmp_path):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(calls))
    from textboost_tpu.utils.trackers import Trackers

    t = Trackers("wandb", str(tmp_path), config={"lr": 1e-4})
    assert t.active
    assert calls[0][0] == "init"
    t.log({"loss": 0.5}, step=3)
    assert ("log", {"loss": 0.5}, 3) in calls
    t.log_images("val", [np.zeros((8, 8, 3), np.uint8)], step=3, captions=["c"])
    assert any(c[0] == "image" for c in calls)
    t.finish()
    assert ("finish",) in calls


def test_unavailable_backend_degrades(tmp_path):
    from textboost_tpu.utils.trackers import Trackers

    t = Trackers("comet_ml", str(tmp_path))  # not installed -> inactive
    assert not t.active
    t.log({"loss": 1.0}, 0)  # no-op, no crash
    t.finish()


def test_tensorboard_backend(tmp_path):
    from textboost_tpu.utils.trackers import Trackers

    t = Trackers("tensorboard", str(tmp_path))
    if not t.active:  # tensorboard missing in env — degrade is the contract
        return
    t.log({"loss": 0.25}, 1)
    t.log_images("val", [np.zeros((8, 8, 3), np.uint8)], 1)
    t.finish()
    import os

    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_all_selects_every_available(monkeypatch, tmp_path):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(calls))
    from textboost_tpu.utils.trackers import Trackers

    t = Trackers("all", str(tmp_path))
    assert t.active
    assert calls and calls[0][0] == "init"
