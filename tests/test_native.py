"""Native C++ image-op kernel vs numpy reference."""
import numpy as np

from textboost_tpu.data.native import get_lib, normalize_u8


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    out = normalize_u8(arr)
    ref = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert out.dtype == np.float32


def test_large_multithreaded():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, (512, 512, 3), dtype=np.uint8)
    out = normalize_u8(arr, threads=8)
    ref = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_library_builds():
    # The environment ships g++; the native path should actually engage.
    assert get_lib() is not None, "native image_ops failed to build with g++"


def test_affine_bicubic_matches_pil():
    """affine_scale_bicubic_u8 must be bit-exact to PIL's
    Image.transform(AFFINE, BICUBIC) over an edge-padded source — the
    composition torchvision v2.functional.pad(edge) + affine(scale) +
    center_crop the reference's adjust_scale performs
    (/root/reference/textboost/augment/paired_augmentation.py:20-49)."""
    from PIL import Image

    from textboost_tpu.data.native import affine_scale_bicubic

    rng = np.random.default_rng(3)
    for _ in range(25):
        w = int(rng.integers(8, 90))
        h = int(rng.integers(8, 90))
        src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        scale = rng.uniform(0.3, 2.0)
        inv = 1.0 / scale
        pad_w = int(rng.integers(0, 25))
        pad_h = int(rng.integers(0, 25))
        pw, ph = w + 2 * pad_w, h + 2 * pad_h
        m2 = inv * (-pw * 0.5) + pw * 0.5 + rng.uniform(-3, 3)
        m5 = inv * (-ph * 0.5) + ph * 0.5 + rng.uniform(-3, 3)
        out_w = int(rng.integers(4, w + 8))
        out_h = int(rng.integers(4, h + 8))
        padded = np.pad(src, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                        mode="edge")
        ref = np.asarray(
            Image.fromarray(padded).transform(
                (out_w, out_h), Image.AFFINE, (inv, 0, m2, 0, inv, m5),
                resample=Image.BICUBIC,
            )
        )
        got = affine_scale_bicubic(src, pad_w, pad_h, out_w, out_h,
                                   inv, m2, inv, m5)
        assert got is not None
        np.testing.assert_array_equal(ref, got)


def test_adjust_scale_native_matches_pil_fallback():
    """The native fast path and the PIL fallback inside adjust_scale must
    produce identical pixels and captions for the same RNG stream."""
    from PIL import Image

    import textboost_tpu.data.native as native_mod
    from textboost_tpu.data.augment import REFERENCE_CAPTION_MAP, adjust_scale

    rng0 = np.random.default_rng(0)
    img = Image.fromarray(
        rng0.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    )
    for trial in range(30):
        r1 = np.random.default_rng((21, trial))
        r2 = np.random.default_rng((21, trial))
        out1, p1 = adjust_scale(img, "a dog", True, r1, REFERENCE_CAPTION_MAP)
        saved_lib, saved_tried = native_mod._LIB, native_mod._TRIED
        native_mod._LIB, native_mod._TRIED = None, True
        try:
            out2, p2 = adjust_scale(img, "a dog", True, r2,
                                    REFERENCE_CAPTION_MAP)
        finally:
            native_mod._LIB, native_mod._TRIED = saved_lib, saved_tried
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_horizontal_translate_matches_pad_affine_crop():
    """The slice-copy implementation equals the reference composition
    pad(edge, (s,0)) -> integer translate -> center crop."""
    from PIL import Image

    from textboost_tpu.data.augment import (
        REFERENCE_CAPTION_MAP,
        horizontal_translate,
    )

    rng0 = np.random.default_rng(1)
    img = Image.fromarray(rng0.integers(0, 255, (64, 80, 3), dtype=np.uint8))
    for trial in range(40):
        r = np.random.default_rng((23, trial))
        direction = r.integers(0, 2)
        w, _ = img.size
        shift = int(r.uniform(0.15, 0.3) * w)
        arr = np.asarray(img)
        padded = np.pad(arr, ((0, 0), (shift, shift), (0, 0)), mode="edge")
        # translate tx=-s (left) keeps the window ending at the right pad;
        # tx=+s (right) keeps the window starting at the left pad
        ref = padded[:, 2 * shift: 2 * shift + w] if direction == 0 \
            else padded[:, 0:w]
        r2 = np.random.default_rng((23, trial))
        out, _ = horizontal_translate(img, "p", True, r2,
                                      REFERENCE_CAPTION_MAP)
        np.testing.assert_array_equal(ref, np.asarray(out))
