"""On-device data augmentation (jax.random rewrites of the reference's GPU
augs, /root/reference/models/utils.py:9-46 GridMask and :220-306
GpuPhotoMetricDistortion). All shape-static and jit-safe: random *values*
flow through arithmetic, never through shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def grid_mask(rng: jax.Array, imgs: jnp.ndarray, ratio: float = 0.5,
              prob: float = 0.7) -> jnp.ndarray:
    """Random grid occlusion. imgs: [N, H, W, C] (any leading batch folded in).

    Keeps pixels inside the union of row/col bands of width ``l ~ d*ratio``
    spaced ``d`` apart (d ~ U{2..H-1}); zeroes the rest. Applied with
    probability ``prob`` (one draw for the whole call, like the reference).
    """
    n, h, w, c = imgs.shape
    k_apply, k_d, k_sh, k_sw = jax.random.split(rng, 4)
    apply = jax.random.uniform(k_apply) < prob
    d = jax.random.randint(k_d, (), 2, h)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    off_h = (int(1.5 * h) - h) // 2
    off_w = (int(1.5 * w) - w) // 2
    row_band = ((ys + off_h - st_h) % d) < l
    col_band = ((xs + off_w - st_w) % d) < l
    keep = (row_band | col_band).astype(imgs.dtype)  # [H, W]
    out = imgs * keep[None, :, :, None]
    return jnp.where(apply, out, imgs)


def rgb_to_hsv(image: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[..., H, W, 3] RGB in [0,255] -> HSV with H in [0,360), S,V in [0,1]/[0,255]
    (matches the kornia-derived reference, models/utils.py:124-176)."""
    img = image / 255.0
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    max_rgb = jnp.max(img, axis=-1)
    argmax_rgb = jnp.argmax(img, axis=-1)
    min_rgb = jnp.min(img, axis=-1)
    deltac = max_rgb - min_rgb

    v = max_rgb
    s = deltac / (max_rgb + eps)
    deltac_safe = jnp.where(deltac == 0, 1.0, deltac)

    rc = max_rgb - r
    gc = max_rgb - g
    bc = max_rgb - b
    h1 = (bc - gc) / deltac_safe
    h2 = ((rc - bc) + 2.0 * deltac_safe) / deltac_safe
    h3 = ((gc - rc) + 4.0 * deltac_safe) / deltac_safe
    h = jnp.where(argmax_rgb == 0, h1, jnp.where(argmax_rgb == 1, h2, h3))
    h = (h / 6.0) % 1.0 * 360.0
    return jnp.stack([h, s, v * 255.0], axis=-1)


def hsv_to_rgb(image: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_hsv` (models/utils.py:179-217)."""
    h = image[..., 0] / 360.0
    s = image[..., 1]
    v = image[..., 2] / 255.0

    hi = jnp.floor(h * 6) % 6
    f = (h * 6) % 6 - hi
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)

    hi = hi.astype(jnp.int32)
    r = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1) * 255.0


def photometric_distortion(rng: jax.Array, imgs: jnp.ndarray,
                           brightness_delta: float = 32.0,
                           contrast_range: Tuple[float, float] = (0.5, 1.5),
                           saturation_range: Tuple[float, float] = (0.5, 1.5),
                           hue_delta: float = 18.0) -> jnp.ndarray:
    """Per-image random brightness/contrast/saturation/hue/channel-swap.

    imgs: [N, H, W, 3] **BGR** float in [0, 255] (the loader's raw layout);
    internally converts to RGB like the reference (models/utils.py:256).
    """
    n = imgs.shape[0]
    keys = jax.random.split(rng, 10)
    imgs = imgs[..., ::-1]  # BGR -> RGB

    def u(key, lo, hi):
        return jax.random.uniform(key, (n, 1, 1, 1), minval=lo, maxval=hi)

    def gate(key):
        return jax.random.bernoulli(key, 0.5, (n, 1, 1, 1))

    contrast_mode = jax.random.bernoulli(keys[0], 0.5, (n, 1, 1, 1))
    # brightness
    delta = u(keys[1], -brightness_delta, brightness_delta)
    imgs = jnp.where(gate(keys[2]), imgs + delta, imgs)
    # contrast (mode 0: first)
    alpha = u(keys[3], *contrast_range)
    do_c = gate(keys[4])
    imgs = jnp.where(~contrast_mode & do_c, imgs * alpha, imgs)

    hsv = rgb_to_hsv(imgs)
    sat = u(keys[5], *saturation_range)[..., 0]
    do_s = gate(keys[6])[..., 0]
    s_new = jnp.where(do_s, hsv[..., 1] * sat, hsv[..., 1])
    hue = u(keys[7], -hue_delta, hue_delta)[..., 0]
    do_h = gate(keys[8])[..., 0]
    h_new = jnp.where(do_h, hsv[..., 0] + hue, hsv[..., 0])
    h_new = jnp.where(h_new > 360, h_new - 360, h_new)
    h_new = jnp.where(h_new < 0, h_new + 360, h_new)
    imgs = hsv_to_rgb(jnp.stack([h_new, s_new, hsv[..., 2]], axis=-1))

    # contrast (mode 1: last)
    imgs = jnp.where(contrast_mode & do_c, imgs * alpha, imgs)
    # random channel swap (one of 6 permutations per image)
    perms = jnp.asarray([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                         [1, 2, 0], [2, 0, 1], [2, 1, 0]])
    k_swap, k_do = jax.random.split(keys[9])
    perm_idx = jax.random.randint(k_swap, (n,), 0, 6)
    do_swap = jax.random.bernoulli(k_do, 0.5, (n,))
    perm = jnp.where(do_swap[:, None], perms[perm_idx], perms[0][None])
    imgs = jnp.take_along_axis(imgs, perm[:, None, None, :], axis=-1)

    return imgs[..., ::-1]  # RGB -> BGR
