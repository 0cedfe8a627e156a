"""Device-side paired augmentation (`--augment_device`).

Host-side augmentation regenerates every pixel of the batch each step and
ships ~6.3 MB/step over the h2d tunnel — under relay degradation that
alone pushed e2e loops to 2-3.7x the device step time (CLAUDE.md r4
addendum), and PIL resampling burns the bench host's single core.  This
module moves pixel work to the TPU: the instance images upload ONCE as a
uint8 bank, the host only PLANS each sample (augment.PairedAugmentation.plan
— a handful of scalars + the caption), and a jitted kernel executes the
plan on device.  Per-step h2d shrinks to the token ids + ~60 bytes/sample.

Execution order differs from the host path in one documented way: the host
augments the ORIGINAL image and then resizes/crops to `size`; the device
crops from the (host-pre-resized) bank first and augments at `size`².  For
the flagship one-shot case (square instance images at the training
resolution) the two paths coincide; otherwise they are statistically
equivalent but not pixel-identical.  The host PIL path therefore remains
the default for bit-exact reference semantics.

Pixel semantics per op (tests/test_device_augment.py):
- hflip / translate / grayscale: bit-exact vs the PIL path (gathers,
  integer luma with PIL's fixed-point coefficients).
- zoom (adjust_scale): PIL `Image.transform(AFFINE, BICUBIC)` semantics —
  a=-1 cubic in difference-Horner form, taps clamped into the virtual
  edge-pad then into the source, truncation — mirroring the bit-exact C++
  host kernel (csrc/image_ops.cpp), computed in f32 => tolerance-tested.
- crop / collage: PIL `resize(BICUBIC)` semantics — a=-0.5 Keys kernel,
  window [center-support+0.5, ...), dropped out-of-range taps with weight
  renormalization, antialias (support*=scale) on downscale — PIL
  quantizes weights to fixed point, so tolerance-tested.
- collage axis=3 tiles to (size//3)*3 < size; the host pipeline then
  LANCZOS-upscales back — replicated with a lanczos3 resample.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .augment import _inverse_affine_matrix

# Per-sample parameter schema ([B]-stacked by `stack_aug_params`).
AUG_PARAM_FIELDS: Dict[str, np.dtype] = {
    "img_idx": np.int32,
    "top": np.int32,
    "left": np.int32,
    "flip_first": np.int32,
    "geo_op": np.int32,  # 0 none, 1 zoom, 2 crop, 3 translate, 4 hflip
    "zoom_a": np.float32,
    "zoom_cx": np.float32,
    "zoom_cy": np.float32,
    "zoom_pad_w": np.int32,
    "zoom_pad_h": np.int32,
    "crop_x": np.int32,
    "crop_y": np.int32,
    "crop_nw": np.int32,
    "crop_nh": np.int32,
    "tr_dir": np.int32,
    "tr_shift": np.int32,
    "collage_axis": np.int32,  # 0 none, 2, 3
    "gray": np.int32,
}

_GEO_OPS = {"scale": 1, "crop": 2, "translate": 3, "hflip": 4}


def encode_plan(
    steps: List[Dict], size: int, img_idx: int, top: int, left: int
) -> Dict[str, np.ndarray]:
    """PairedAugmentation.plan() steps -> fixed-size numeric params.

    The plan's op order (base_hflip -> geometric -> collage -> grayscale,
    augment.PairedAugmentation.plan) maps onto fixed slots; the device
    executor applies slots in that same order."""
    p = {k: np.zeros((), dt) for k, dt in AUG_PARAM_FIELDS.items()}
    p["img_idx"] = np.int32(img_idx)
    p["top"] = np.int32(top)
    p["left"] = np.int32(left)
    for st in steps:
        op = st["op"]
        if op == "base_hflip":
            p["flip_first"] = np.int32(1)
        elif op == "hflip":
            p["geo_op"] = np.int32(_GEO_OPS["hflip"])
        elif op == "scale":
            p["geo_op"] = np.int32(_GEO_OPS["scale"])
            pad_w, pad_h = st["pad_w"], st["pad_h"]
            pw, ph = size + 2 * pad_w, size + 2 * pad_h
            inv, m2, m5 = _inverse_affine_matrix(pw, ph, st["scale"])
            # The output window offset folds into the matrix constants
            # exactly as in augment.exec_adjust_scale.
            left_off = int(round((pw - size) / 2.0))
            top_off = int(round((ph - size) / 2.0))
            p["zoom_a"] = np.float32(inv)
            p["zoom_cx"] = np.float32(m2 + inv * left_off)
            p["zoom_cy"] = np.float32(m5 + inv * top_off)
            p["zoom_pad_w"] = np.int32(pad_w)
            p["zoom_pad_h"] = np.int32(pad_h)
        elif op == "crop":
            p["geo_op"] = np.int32(_GEO_OPS["crop"])
            p["crop_x"] = np.int32(st["x"])
            p["crop_y"] = np.int32(st["y"])
            p["crop_nw"] = np.int32(st["nw"])
            p["crop_nh"] = np.int32(st["nh"])
        elif op == "translate":
            p["geo_op"] = np.int32(_GEO_OPS["translate"])
            p["tr_dir"] = np.int32(st["direction"])
            p["tr_shift"] = np.int32(st["shift"])
        elif op == "collage":
            p["collage_axis"] = np.int32(st["axis"])
        elif op == "grayscale":
            p["gray"] = np.int32(1)
        else:
            # brightness / rotate / jpeg are unreachable from the object and
            # style op banks; no device executor exists for them.
            raise ValueError(f"augmentation op '{op}' has no device executor")
    return p


def stack_aug_params(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in AUG_PARAM_FIELDS}


def build_image_bank(paths, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + shorter-side-resize every instance image once; pad to the
    common extent.  Returns (bank u8 [N,Hb,Wb,3], dims i32 [N,2] true h/w).
    Uploaded to the device a single time by the trainer."""
    from .datasets import load_rgb, resize_shorter_side

    imgs = []
    for path in paths:
        img = resize_shorter_side(load_rgb(path), size)
        imgs.append(np.asarray(img, np.uint8))
    hb = max(a.shape[0] for a in imgs)
    wb = max(a.shape[1] for a in imgs)
    bank = np.zeros((len(imgs), hb, wb, 3), np.uint8)
    dims = np.zeros((len(imgs), 2), np.int32)
    for i, a in enumerate(imgs):
        bank[i, : a.shape[0], : a.shape[1]] = a
        dims[i] = (a.shape[0], a.shape[1])
    return bank, dims


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------
def _pil_cubic(v1, v2, v3, v4, d):
    """Pillow's BICUBIC transform macro (kernel a=-1) in its exact
    difference-Horner form (csrc/image_ops.cpp::pil_cubic)."""
    p2 = -v1 + v3
    p3 = 2.0 * (v1 - v2) + v3 - v4
    p4 = -v1 + v2 - v3 + v4
    return v2 + d * (p2 + d * (p3 + d * p4))


def _keys_cubic(t):
    """Pillow's resize BICUBIC filter (Keys a=-0.5)."""
    import jax.numpy as jnp

    a = -0.5
    at = jnp.abs(t)
    return jnp.where(
        at < 1.0,
        ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0,
        jnp.where(at < 2.0, a * (((at - 5.0) * at + 8.0) * at - 4.0), 0.0),
    )


def _lanczos3(t):
    import jax.numpy as jnp

    at = jnp.abs(t)
    pt = jnp.pi * t
    safe = jnp.where(at < 1e-6, 1.0, pt)
    val = jnp.where(
        at < 1e-6,
        1.0,
        3.0 * jnp.sin(safe) * jnp.sin(safe / 3.0) / (safe * safe),
    )
    return jnp.where(at < 3.0, val, 0.0)


def _affine_axis(img, a, c, pad, size):
    """Resample `img` [R, size, C] along axis 1 with PIL-transform bicubic:
    position a*(j+0.5)+c in the virtual edge-padded extent [0, size+2*pad).
    Returns (values f32 [R,size,C], in_bounds [size])."""
    import jax.numpy as jnp

    w_ext = size + 2 * pad  # traced
    pos = a * (jnp.arange(size, dtype=jnp.float32) + 0.5) + c
    ok = (pos >= 0.0) & (pos < w_ext.astype(jnp.float32))
    p = pos - 0.5
    f = jnp.floor(p)
    d = (p - f)[None, :, None]
    fi = f.astype(jnp.int32)
    vals = []
    for t in range(4):
        idx = jnp.clip(jnp.clip(fi - 1 + t, 0, w_ext - 1) - pad, 0, size - 1)
        vals.append(jnp.take(img, idx, axis=1))
    return _pil_cubic(*vals, d), ok


def _zoom(x_u8, p, size):
    """adjust_scale on device: separable PIL-transform bicubic over the
    virtual edge-pad, truncation to u8 (image_ops.cpp semantics)."""
    import jax.numpy as jnp

    xf = x_u8.astype(jnp.float32)
    # Horizontal: operate on [H, W, C] axis 1; vertical: transpose.
    h_out, ok_x = _affine_axis(xf, p["zoom_a"], p["zoom_cx"], p["zoom_pad_w"], size)
    v_in = jnp.swapaxes(h_out, 0, 1)  # [W, H, C]
    v_out, ok_y = _affine_axis(v_in, p["zoom_a"], p["zoom_cy"], p["zoom_pad_h"], size)
    out = jnp.swapaxes(v_out, 0, 1)
    out = jnp.where(ok_y[:, None, None] & ok_x[None, :, None], out, 0.0)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)  # truncates like C cast


def _resize_axis_traced(img, x0, n_src, size):
    """PIL resize BICUBIC upscale along axis 1: source window [x0, x0+n_src)
    of `img` [R, W, C] -> length `size`.  Window bounds are traced; upscale
    keeps support=2 (5 taps).  Out-of-window taps are dropped and weights
    renormalized, exactly PIL's xmin/xmax truncation."""
    import jax.numpy as jnp

    scale = n_src.astype(jnp.float32) / float(size)
    center = x0.astype(jnp.float32) + (
        jnp.arange(size, dtype=jnp.float32) + 0.5
    ) * scale
    xmin = jnp.floor(center - 2.0 + 0.5).astype(jnp.int32)
    acc = None
    wsum = None
    w_img = img.shape[1]
    for t in range(5):
        idx = xmin + t
        w = _keys_cubic(idx.astype(jnp.float32) + 0.5 - center)
        valid = (idx >= x0) & (idx < x0 + n_src)
        w = jnp.where(valid, w, 0.0)
        v = jnp.take(img, jnp.clip(idx, 0, w_img - 1), axis=1)
        term = w[None, :, None] * v
        acc = term if acc is None else acc + term
        wsum = w if wsum is None else wsum + w
    return acc / wsum[None, :, None]


def _crop_rrc(x_u8, p, size):
    """random_resized_crop(ratio=1): crop box (traced) + BICUBIC upscale
    back to size², PIL resize semantics, rounded to u8."""
    import jax.numpy as jnp

    xf = x_u8.astype(jnp.float32)
    h_out = _resize_axis_traced(xf, p["crop_x"], p["crop_nw"], size)
    # PIL's two-pass resize quantizes the intermediate to uint8 between the
    # horizontal and vertical passes (8bpc path) — skipping this costs up
    # to 16/255 of divergence on sharp random textures.
    h_out = jnp.clip(jnp.round(h_out), 0.0, 255.0)
    v_in = jnp.swapaxes(h_out, 0, 1)
    v_out = _resize_axis_traced(v_in, p["crop_y"], p["crop_nh"], size)
    out = jnp.swapaxes(v_out, 0, 1)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def _translate(x_u8, p, size):
    """Integer column shift with one edge column replicated — exact
    (augment.exec_horizontal_translate as a gather)."""
    import jax.numpy as jnp

    j = jnp.arange(size, dtype=jnp.int32)
    src_left = jnp.minimum(j + p["tr_shift"], size - 1)  # content moves left
    src_right = jnp.maximum(j - p["tr_shift"], 0)  # content moves right
    src = jnp.where(p["tr_dir"] == 0, src_left, src_right)
    return jnp.take(x_u8, src, axis=1)


def _resize_axis_static(img, out_size, kernel, support, antialias_scale):
    """PIL resize along axis 1 with STATIC geometry (collage down/upscale):
    in length = img.shape[1], out length = out_size."""
    import jax.numpy as jnp

    in_size = img.shape[1]
    scale = in_size / out_size
    filterscale = max(scale, 1.0) if antialias_scale else 1.0
    supp = support * filterscale
    ksize = int(math.ceil(supp)) * 2 + 1
    center = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale
    xmin = jnp.floor(center - supp + 0.5).astype(jnp.int32)
    acc = None
    wsum = None
    for t in range(ksize):
        idx = xmin + t
        w = kernel((idx.astype(jnp.float32) + 0.5 - center) / filterscale)
        valid = (idx >= 0) & (idx < in_size)
        w = jnp.where(valid, w, 0.0)
        v = jnp.take(img, jnp.clip(idx, 0, in_size - 1), axis=1)
        term = w[None, :, None] * v
        acc = term if acc is None else acc + term
        wsum = w if wsum is None else wsum + w
    return acc / wsum[None, :, None]


def _resize_static(x_f32, out_h, out_w, kernel, support, antialias):
    import jax.numpy as jnp

    h = _resize_axis_static(x_f32, out_w, kernel, support, antialias)
    h = jnp.clip(jnp.round(h), 0.0, 255.0)  # PIL quantizes between passes
    v = jnp.swapaxes(
        _resize_axis_static(jnp.swapaxes(h, 0, 1), out_h, kernel, support, antialias),
        0,
        1,
    )
    return v


def _collage(x_u8, size, axis):
    """square_photo_collage: BICUBIC downscale (antialiased) to the grid
    tile, black borders, tile axis², then — when axis doesn't divide size —
    the host pipeline's trailing shorter-side LANCZOS upscale back to size."""
    import jax.numpy as jnp

    g = size // axis
    small = _resize_static(x_u8.astype(jnp.float32), g, g, _keys_cubic, 2.0, True)
    small = jnp.clip(jnp.round(small), 0.0, 255.0).astype(jnp.uint8)
    small = small.at[0, :].set(0).at[-1, :].set(0)
    small = small.at[:, 0].set(0).at[:, -1].set(0)
    grid = jnp.tile(small, (axis, axis, 1))
    if g * axis != size:
        up = _resize_static(grid.astype(jnp.float32), size, size, _lanczos3, 3.0, False)
        grid = jnp.clip(jnp.round(up), 0.0, 255.0).astype(jnp.uint8)
    return grid


def _grayscale(x_u8):
    """PIL convert('L') exact integer luma: (19595R + 38470G + 7471B +
    0x8000) >> 16, replicated to RGB."""
    import jax.numpy as jnp

    xi = x_u8.astype(jnp.int32)
    l24 = 19595 * xi[..., 0] + 38470 * xi[..., 1] + 7471 * xi[..., 2] + 0x8000
    l8 = (l24 >> 16).astype(jnp.uint8)
    return jnp.stack([l8, l8, l8], axis=-1)


def make_augment_fn(size: int):
    """Build augment_batch(bank u8 [N,Hb,Wb,3], params {field: [B]}) ->
    u8 [B,size,size,3], jit-compatible (wrap in jax.jit at the call site
    to pin out_shardings)."""
    import jax
    import jax.numpy as jnp

    def one(bank, p):
        img = bank[p["img_idx"]]
        x = jax.lax.dynamic_slice(img, (p["top"], p["left"], 0), (size, size, 3))
        x = jnp.where(p["flip_first"] == 1, x[:, ::-1], x)

        geo_branches = [
            lambda x, p: x,
            lambda x, p: _zoom(x, p, size),
            lambda x, p: _crop_rrc(x, p, size),
            lambda x, p: _translate(x, p, size),
            lambda x, p: x[:, ::-1],
        ]
        x = jax.lax.switch(jnp.clip(p["geo_op"], 0, 4), geo_branches, x, p)

        col_branches = [
            lambda x: x,
            lambda x: _collage(x, size, 2),
            lambda x: _collage(x, size, 3),
        ]
        col_idx = jnp.where(
            p["collage_axis"] == 2, 1, jnp.where(p["collage_axis"] == 3, 2, 0)
        )
        x = jax.lax.switch(col_idx, col_branches, x)
        return jnp.where(p["gray"] == 1, _grayscale(x), x)

    def augment_batch(bank, params):
        return jax.vmap(one, in_axes=(None, 0))(jnp.asarray(bank), params)

    return augment_batch
