"""Image IO + sampling utilities for the image-fitting demo/benchmark.

The reference samples the training image through a CUDA texture object with
linear filtering and normalized coordinates (samples/mlp_learning_an_image.cu)
- i.e. bilinear interpolation at pixel centers with edge clamping. `sample_image`
reproduces that convention in jnp (same math as the torch sample's
bilinear, samples/mlp_learning_an_image_pytorch.py:64-84).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_image(path: str) -> np.ndarray:
    """Load an image file -> float32 [H, W, 3] in [0, 1] (sRGB values)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def save_image(path: str, img) -> None:
    from PIL import Image

    arr = np.asarray(img)
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def synthetic_image(height: int = 512, width: int = 512) -> np.ndarray:
    """Deterministic multi-scale test pattern for benchmarks when no image
    file is available (smooth gradients + rings + high-frequency checker)."""
    y, x = np.mgrid[0:height, 0:width].astype(np.float32)
    u, v = x / width, y / height
    r = np.sqrt((u - 0.5) ** 2 + (v - 0.5) ** 2)
    red = 0.5 + 0.5 * np.sin(40.0 * r) * np.exp(-3 * r)
    green = 0.5 + 0.5 * np.sin(12 * u) * np.cos(9 * v)
    blue = ((np.floor(u * 32) + np.floor(v * 32)) % 2) * (0.3 + 0.7 * u)
    return np.stack([red, green, blue], -1).astype(np.float32)


def sample_image(image, xy):
    """Bilinear sample `image` [H, W, C] at normalized coords `xy` [B, 2]
    (x first, like the reference's tex2D(x, y)), edge-clamped, pixel-center
    convention: x=u maps to column u*W - 0.5."""
    image = jnp.asarray(image)
    h, w = image.shape[0], image.shape[1]
    fx = xy[:, 0] * w - 0.5
    fy = xy[:, 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def at(yi, xi):
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        return image[yi, xi]

    c00 = at(y0, x0)
    c01 = at(y0, x0 + 1)
    c10 = at(y0 + 1, x0)
    c11 = at(y0 + 1, x0 + 1)
    tx = tx[:, None]
    ty = ty[:, None]
    top = c00 * (1 - tx) + c01 * tx
    bot = c10 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def pixel_center_coords(height: int, width: int) -> np.ndarray:
    """[(H*W), 2] normalized (x, y) at pixel centers - the evaluation lattice
    of the reference demo (mlp_learning_an_image.cu:176-189)."""
    y, x = np.mgrid[0:height, 0:width].astype(np.float32)
    u = (x + 0.5) / width
    v = (y + 0.5) / height
    return np.stack([u.ravel(), v.ravel()], -1)
