"""Image preprocessing for the CLIP encoder.

Parity target: clip_image_preprocess (reference examples/llava/clip.cpp):
resize to the model's square input with bilinear interpolation, scale to
[0,1], normalize per channel with the mmproj's image_mean/std.  llava-1.6
anyres grid slicing (select_best_resolution + pad) is implemented for the
"spatial_unpad" merge type's slice geometry; the flat path (llava-1.5)
resizes directly.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """img [H, W, C] float -> [out_h, out_w, C], align-corners=False
    (matches the reference's bilinear_resize helper)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


def preprocess(image: np.ndarray, cfg) -> np.ndarray:
    """uint8/float [H, W, 3] -> normalized [3, S, S] f32."""
    img = np.asarray(image, np.float32)
    if img.max() > 1.5:  # uint8 range
        img = img / 255.0
    s = cfg.image_size
    if img.shape[:2] != (s, s):
        img = bilinear_resize(img, s, s)
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    img = (img - mean) / std
    return img.transpose(2, 0, 1).astype(np.float32)


def select_best_resolution(orig_w: int, orig_h: int,
                           pinpoints: Iterable[int]) -> tuple[int, int]:
    """llava-1.6 anyres: pick the grid resolution that maximizes effective
    resolution with minimal wasted area (clip.cpp select_best_resolution)."""
    best = None
    best_fit = (-1, float("inf"))
    pts = list(pinpoints)
    for i in range(0, len(pts) - 1, 2):
        gw, gh = pts[i], pts[i + 1]
        scale = min(gw / orig_w, gh / orig_h)
        dw, dh = int(orig_w * scale), int(orig_h * scale)
        eff = min(dw * dh, orig_w * orig_h)
        waste = gw * gh - eff
        if (eff, waste) > (best_fit[0], -best_fit[1]) and (
                eff > best_fit[0] or (eff == best_fit[0] and waste < best_fit[1])):
            best_fit = (eff, waste)
            best = (gw, gh)
    return best or (pts[0], pts[1])


def resize_and_pad(img: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Aspect-preserving resize then centered zero (black) padding to the
    target resolution (clip.cpp resize_and_pad_image:1694) — llava-1.6
    anyres tiles must NOT contain stretched content."""
    h, w = img.shape[:2]
    scale_w, scale_h = target_w / w, target_h / h
    if scale_w < scale_h:
        new_w = target_w
        new_h = min(int(np.ceil(h * scale_w)), target_h)
    else:
        new_h = target_h
        new_w = min(int(np.ceil(w * scale_h)), target_w)
    resized = bilinear_resize(img, new_h, new_w)
    out = np.zeros((target_h, target_w, img.shape[2]), np.float32)
    pad_y = (target_h - new_h) // 2
    pad_x = (target_w - new_w) // 2
    out[pad_y:pad_y + new_h, pad_x:pad_x + new_w] = resized
    return out


# -- minicpmv LLaVA-UHD slicing (clip.cpp:1791-1935) --------------------------


def _ensure_divide(length: int, patch: int) -> int:
    return max(int(round(length / patch) * patch), patch)


def uhd_find_best_resize(w: int, h: int, scale_resolution: int = 448,
                         patch: int = 14, allow_upscale: bool = False) -> tuple[int, int]:
    if (w * h > scale_resolution * scale_resolution) or allow_upscale:
        r = w / h
        h = int(scale_resolution / np.sqrt(r))
        w = int(h * r)
    return _ensure_divide(w, patch), _ensure_divide(h, patch)


def uhd_best_grid(max_slice_nums: int, multiple: int, log_ratio: float) -> tuple[int, int]:
    candidates = []
    for i in (multiple - 1, multiple, multiple + 1):
        if i == 1 or i > max_slice_nums:
            continue
        for m in range(1, i + 1):
            if i % m == 0:
                candidates.append((m, i // m))
    best, best_err = (1, 1), float("inf")
    for gx, gy in candidates:
        err = abs(log_ratio - np.log(gx / gy))
        if err < best_err:
            best, best_err = (gx, gy), err
    return best


def uhd_get_refine_size(w: int, h: int, grid: tuple[int, int],
                        scale_resolution: int = 448, patch: int = 14,
                        allow_upscale: bool = False) -> tuple[int, int]:
    gx, gy = grid
    rw, rh = _ensure_divide(w, gx), _ensure_divide(h, gy)
    bw, bh = uhd_find_best_resize(rw // gx, rh // gy, scale_resolution, patch,
                                  allow_upscale)
    return bw * gx, bh * gy


def uhd_slice_image(image: np.ndarray, cfg, max_slice_nums: int = 9,
                    scale_resolution: int = 448):
    """minicpmv LLaVA-UHD slicing (uhd_slice_image, clip.cpp:1870): returns
    (source [3,h,w] normalized, slices list-of-rows of [3,h,w] normalized,
    grid (gx, gy)).  Uses bilinear resize (reference: bicubic)."""
    h, w = image.shape[:2]
    img = np.asarray(image, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)

    def norm(x):
        return ((x - mean) / std).transpose(2, 0, 1).astype(np.float32)

    patch = cfg.patch_size
    log_ratio = np.log(w / h)
    ratio = w * h / (scale_resolution * scale_resolution)
    multiple = int(min(np.ceil(ratio), max_slice_nums))

    if multiple <= 1:
        bw, bh = uhd_find_best_resize(w, h, scale_resolution, patch, allow_upscale=True)
        return norm(bilinear_resize(img, bh, bw)), [], (1, 1)

    bw, bh = uhd_find_best_resize(w, h, scale_resolution, patch)
    source = norm(bilinear_resize(img, bh, bw))
    grid = uhd_best_grid(max_slice_nums, multiple, log_ratio)
    rw, rh = uhd_get_refine_size(w, h, grid, scale_resolution, patch, allow_upscale=True)
    refined = bilinear_resize(img, rh, rw)
    gx, gy = grid
    sw, sh = rw // gx, rh // gy
    rows = []
    for r in range(gy):
        rows.append([norm(refined[r * sh:(r + 1) * sh, c * sw:(c + 1) * sw])
                     for c in range(gx)])
    return source, rows, grid


def anyres_slices(image: np.ndarray, cfg) -> tuple[list[np.ndarray], tuple[int, int]]:
    """llava-1.6: resize to the best grid resolution, cut into
    image_size x image_size tiles, prepend the base (flat-resized) image.
    Returns ([3, S, S] preprocessed tensors, (tiles_x, tiles_y) grid shape
    — needed for the spatial_unpad patch re-rastering, reference
    examples/llava/llava.cpp clip_llava_handle_patches:89)."""
    s = cfg.image_size
    h, w = image.shape[:2]
    gw, gh = select_best_resolution(w, h, cfg.image_grid_pinpoints)
    img = np.asarray(image, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    # aspect-preserving resize + centered pad (clip.cpp:2023 calls
    # resize_and_pad_image) — a direct stretch would distort tile content
    # whenever the image aspect doesn't match the chosen pinpoint
    resized = resize_and_pad(img, gh, gw)
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    out = [preprocess(image, cfg)]  # base image first (flat resize)
    for y in range(0, gh, s):
        for x in range(0, gw, s):
            tile = resized[y : y + s, x : x + s]
            if tile.shape[:2] != (s, s):
                pad = np.zeros((s, s, 3), np.float32)
                pad[: tile.shape[0], : tile.shape[1]] = tile
                tile = pad
            out.append(((tile - mean) / std).transpose(2, 0, 1).astype(np.float32))
    return out, (-(-gw // s), -(-gh // s))  # ceil: loop pads partial tiles
