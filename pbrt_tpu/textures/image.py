"""Image texture atlas: loading, (later) mip pyramid, bilinear sampling.

Reference: core/src/mipmap/ (MIPMap pyramid + trilinear/EWA) and
textures/src/imagemap.rs. Round-1 device path is bilinear on level 0 from a
padded [n_images, H, W, 3] atlas; the mip chain + EWA arrive with ray
differentials. Images load through PIL with sRGB -> linear conversion
(gamma handling of image_io.rs:42).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_image(path: str, gamma: bool = True) -> np.ndarray:
    """[H, W, 3] float32 linear."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    if gamma:
        arr = np.where(arr <= 0.04045, arr / 12.92,
                       ((arr + 0.055) / 1.055) ** 2.4)
    return arr.astype(np.float32)


def build_atlas(images):
    """Pad a list of [H,W,3] images into one [n, Hmax, Wmax, 3] array."""
    if not images:
        return np.zeros((0, 1, 1, 3), np.float32), np.zeros((0, 2), np.int32)
    hmax = max(im.shape[0] for im in images)
    wmax = max(im.shape[1] for im in images)
    atlas = np.zeros((len(images), hmax, wmax, 3), np.float32)
    sizes = np.zeros((len(images), 2), np.int32)
    for i, im in enumerate(images):
        atlas[i, :im.shape[0], :im.shape[1]] = im
        sizes[i] = (im.shape[1], im.shape[0])  # (w, h)
    return atlas, sizes


def sample_atlas(tex, tid, st):
    """Bilinear sample: tex is TextureTable, tid [N] table rows, st [N,2]."""
    img = tex.image_id[tid]
    img = jnp.maximum(img, 0)
    w = tex.atlas_size[img, 0].astype(jnp.float32)
    h = tex.atlas_size[img, 1].astype(jnp.float32)
    # wrap (repeat) addressing; flip t (image rows top-down)
    s = st[:, 0] - jnp.floor(st[:, 0])
    t = st[:, 1] - jnp.floor(st[:, 1])
    x = s * w - 0.5
    y = (1.0 - t) * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    wi = tex.atlas_size[img, 0]
    hi = tex.atlas_size[img, 1]

    def pix(xx, yy):
        xx = jnp.mod(xx, wi)
        yy = jnp.mod(yy, hi)
        return tex.atlas[img, yy, xx]

    c = (pix(x0, y0) * (1 - fx) * (1 - fy) + pix(x0 + 1, y0) * fx * (1 - fy)
         + pix(x0, y0 + 1) * (1 - fx) * fy + pix(x0 + 1, y0 + 1) * fx * fy)
    return c
