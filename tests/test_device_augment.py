"""Pixel equivalence: device-side augmentation vs the host PIL path.

Per VERDICT r4 #3: hflip / translate / grayscale are exact; the bicubic
resampling ops (zoom, crop, collage) follow PIL's algorithms in f32 where
PIL uses double (transform) or fixed-point weights (resize), so they get
tight tolerance tests instead of equality.
"""
import numpy as np
import pytest
from PIL import Image

from textboost_tpu.data.augment import (
    PairedAugmentation,
    REFERENCE_CAPTION_MAP,
    exec_adjust_scale,
    exec_crop,
    exec_grayscale,
    exec_horizontal_translate,
    exec_square_photo_collage,
    plan_adjust_scale,
    plan_crop,
    plan_horizontal_translate,
)
from textboost_tpu.data.datasets import resize_shorter_side
from textboost_tpu.data.device_augment import (
    AUG_PARAM_FIELDS,
    build_image_bank,
    encode_plan,
    make_augment_fn,
    stack_aug_params,
)

S = 96


def _img(size=S, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (size, size, 3), dtype=np.uint8))


def _device_apply(image, steps, size=None):
    size = size or image.size[0]
    params = stack_aug_params([encode_plan(steps, size, 0, 0, 0)])
    fn = make_augment_fn(size)
    bank = np.asarray(image, np.uint8)[None]
    return np.asarray(fn(bank, params))[0]


def test_identity_and_hflip_exact():
    img = _img()
    assert np.array_equal(_device_apply(img, []), np.asarray(img))
    got = _device_apply(img, [{"op": "base_hflip"}])
    np.testing.assert_array_equal(got, np.asarray(img)[:, ::-1])
    got = _device_apply(img, [{"op": "hflip"}])
    np.testing.assert_array_equal(got, np.asarray(img)[:, ::-1])


@pytest.mark.parametrize("seed", range(6))
def test_translate_exact(seed):
    img = _img(seed=seed)
    rng = np.random.default_rng(seed)
    p, _ = plan_horizontal_translate(
        img.size, "p", True, rng, REFERENCE_CAPTION_MAP
    )
    want = np.asarray(exec_horizontal_translate(img, p))
    np.testing.assert_array_equal(_device_apply(img, [p]), want)


def test_grayscale_exact():
    # Every possible RGB byte triple would be 16M pixels; a dense random
    # sample plus the known-tricky rounding boundary values suffices.
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    arr[0, :3] = [(255, 255, 255), (0, 0, 0), (128, 128, 128)]
    img = Image.fromarray(arr)
    want = np.asarray(exec_grayscale(img, {}))
    got = _device_apply(img, [{"op": "grayscale"}])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(8))
def test_zoom_close(seed):
    img = _img(seed=seed)
    rng = np.random.default_rng((5, seed))
    p, _ = plan_adjust_scale(img.size, "p", True, rng, REFERENCE_CAPTION_MAP)
    want = np.asarray(exec_adjust_scale(img, p)).astype(np.int32)
    got = _device_apply(img, [p]).astype(np.int32)
    # f32 vs double bicubic + trailing truncation: off-by-one at worst.
    assert np.abs(got - want).max() <= 1, (
        p, np.abs(got - want).max(), (np.abs(got - want) > 1).mean())


@pytest.mark.parametrize("seed", range(8))
def test_crop_close(seed):
    img = _img(seed=seed)
    rng = np.random.default_rng((7, seed))
    p, _ = plan_crop(img.size, "p", True, rng, REFERENCE_CAPTION_MAP)
    want = np.asarray(exec_crop(img, p)).astype(np.int32)
    got = _device_apply(img, [p]).astype(np.int32)
    assert np.abs(got - want).max() <= 2, (p, np.abs(got - want).max())


@pytest.mark.parametrize("axis,size", [(2, 96), (3, 96), (2, 128), (3, 128)])
def test_collage_close(axis, size):
    # axis=3 at size=128 exercises the 126->128 LANCZOS upscale tail the
    # host pipeline applies via resize_shorter_side.
    img = _img(size=size, seed=axis)
    p = {"op": "collage", "axis": axis}
    host = exec_square_photo_collage(img, p)
    host = resize_shorter_side(host, size)  # identity when axis | size
    want = np.asarray(host).astype(np.int32)
    got = _device_apply(img, [p], size=size).astype(np.int32)
    assert got.shape == want.shape
    assert np.abs(got - want).max() <= 3, np.abs(got - want).max()


def test_full_plan_equivalence_sweep():
    """Same seeded RNG stream -> host __call__ and device plan+execute
    produce the same prompt and (near-)identical pixels on a square
    at-resolution image — the flagship one-shot configuration."""
    img = _img(seed=42)
    pipe = PairedAugmentation(
        hflip="inversion", inversion=True, p=0.5, ops="object",
        caption_map=None, seed=0,
    )
    n_exact = 0
    for trial in range(24):
        r_host = np.random.default_rng((99, trial))
        r_dev = np.random.default_rng((99, trial))
        host_img, host_prompt, _ = pipe(img, "a <x>", r_host)
        host_img = resize_shorter_side(host_img, S)  # host pipeline tail
        steps, dev_prompt = pipe.plan(img.size, "a <x>", r_dev)
        assert dev_prompt == host_prompt
        got = _device_apply(img, steps).astype(np.int32)
        want = np.asarray(host_img).astype(np.int32)
        assert got.shape == want.shape, (steps,)
        assert np.abs(got - want).max() <= 3, (
            steps, np.abs(got - want).max())
        if np.array_equal(got, want):
            n_exact += 1
    assert n_exact >= 8  # plans without resampling ops must be exact


def test_encode_plan_rejects_non_device_ops():
    with pytest.raises(ValueError, match="no device executor"):
        encode_plan([{"op": "brightness", "factor": 1.4}], S, 0, 0, 0)
    with pytest.raises(ValueError, match="no device executor"):
        encode_plan([{"op": "jpeg", "quality": 50}], S, 0, 0, 0)


def test_bank_and_crop_slice():
    # Non-square source: bank pads to the max extent; top/left crop selects
    # the window exactly like crop_with_offsets.
    rng = np.random.RandomState(1)
    wide = Image.fromarray(rng.randint(0, 255, (S, S + 40, 3), dtype=np.uint8))
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "a.png")
        wide.save(path)
        bank, dims = build_image_bank([path], S)
    assert bank.shape == (1, S, S + 40, 3)
    assert tuple(dims[0]) == (S, S + 40)
    params = stack_aug_params([encode_plan([], S, 0, 0, 17)])
    got = np.asarray(make_augment_fn(S)(bank, params))[0]
    np.testing.assert_array_equal(got, bank[0, :, 17 : 17 + S])


def test_param_schema_is_small():
    # The whole point: per-sample upload is ~this many bytes, not 786 KB.
    nbytes = sum(np.dtype(dt).itemsize for dt in AUG_PARAM_FIELDS.values())
    assert nbytes <= 80
