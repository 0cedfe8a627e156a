"""Aux datasets (offline-capable paths)."""
import json

import numpy as np
from PIL import Image

from textboost_tpu.data import HashTokenizer
from textboost_tpu.data.aux_datasets import JsonDataset
from textboost_tpu.data.datasets import FolderDataset, PromptDataset


def _save_img(path, seed=0, size=96):
    Image.fromarray(
        np.random.RandomState(seed).randint(0, 255, (size, size, 3), dtype=np.uint8)
    ).save(path)


def test_json_dataset_local_paths(tmp_path):
    img = tmp_path / "style.jpg"
    _save_img(img)
    records = [{"image": str(img), "caption": "watercolor style", "token": "<s>"}]
    jf = tmp_path / "styles.json"
    jf.write_text(json.dumps(records))
    ds = JsonDataset(str(jf), HashTokenizer(), size=64, template="A cat in {}")
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["prompt"] == "A cat in watercolor style"
    assert s["input_ids"].shape == (77,)


def test_folder_dataset(tmp_path):
    _save_img(tmp_path / "a_photo_of_a_dog.png")
    _save_img(tmp_path / "a_red_teapot.png", seed=1)
    ds = FolderDataset(str(tmp_path), size=48)
    assert len(ds) == 2
    s = ds[0]
    assert s["prompt"] == "a photo of a dog"
    assert s["image"].shape == (48, 48, 3)


def test_prompt_dataset():
    ds = PromptDataset("a photo of dog", 5)
    assert len(ds) == 5
    assert ds[3] == {"prompt": "a photo of dog", "index": 3}
