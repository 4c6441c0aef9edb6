"""PIL-semantics antialiased bilinear resize, expressed as two matmuls.

Capability parity: reference component C3 (SURVEY.md §2a) — the transform
chain's ``GroupScale`` (short side -> 256) uses PIL's bilinear resampling,
which *antialiases* on downscale (triangle filter widened by the scale
factor). `jax.image.resize` has similar but not identical semantics, and the
0.5% accuracy-parity budget (BASELINE.json:5) can hinge on the difference
(SURVEY.md §7 hard part #1).

TPU-first design: image sizes are static under jit, so the separable filter
weights are *precomputed on host* (float64, PIL's exact support/center
formula) and the resize becomes two dense matmuls:

    out[oh, ow, c] = Wh[oh, h] @ img[h, w, c] @ Ww[ow, w]^T

Dense matmuls run on the MXU — for a 360x480 -> 256x341 resize the weight
matrices are tiny (256x360, 341x480) and XLA fuses the pair with the
surrounding crop/normalize. This is *exactly* PIL's float arithmetic modulo
PIL's fixed-point coefficient quantization (PIL rounds weights to 1/2^8 LSB
for uint8 images and rounds the output to uint8; we keep float — parity
tests bound the difference to <= 1 LSB).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "scale_short_side_size",
    "bilinear_weights",
    "resize_weights_cached",
    "resize_hw",
    "resize_short_side",
]


def scale_short_side_size(h: int, w: int, size: int) -> tuple[int, int]:
    """Output (oh, ow) for torchvision ``Scale(size)`` semantics.

    Short side becomes ``size``; the long side scales by the same ratio with
    ``int()`` truncation, matching torchvision's Scale/Resize used by the
    reference transform chain (C3). A frame already at the target short side
    keeps its size.
    """
    if h <= w:
        if h == size:
            return h, w
        return size, int(size * w / h)
    if w == size:
        return h, w
    return int(size * h / w), size


def bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] PIL-exact antialiased bilinear weights.

    Reimplements PIL's ``precompute_coeffs`` (triangle filter, support 1.0,
    widened by the downscale factor; weights normalized to sum 1) in float64.
    Rows index output pixels, columns input pixels.
    """
    w = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter has support 1
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax, dtype=np.float64)
        ww = (xs + 0.5 - center) / filterscale
        ww = np.maximum(0.0, 1.0 - np.abs(ww))  # triangle
        s = ww.sum()
        if s > 0:
            ww /= s
        w[i, xmin:xmax] = ww
    return w


@functools.lru_cache(maxsize=256)
def resize_weights_cached(in_size: int, out_size: int) -> np.ndarray:
    """float32 weight matrix, cached per static (in, out) pair."""
    return bilinear_weights(in_size, out_size).astype(np.float32)


def resize_hw(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize [..., H, W, C] float -> [..., out_h, out_w, C] via two matmuls.

    Runs in the input dtype (bf16 on the TPU throughput path — halves HBM
    traffic for the big pre-crop intermediates) with f32 MXU accumulation;
    output keeps the input dtype.
    """
    h, w = img.shape[-3], img.shape[-2]
    wh = jnp.asarray(resize_weights_cached(h, out_h)).astype(img.dtype)
    ww = jnp.asarray(resize_weights_cached(w, out_w)).astype(img.dtype)
    # f32 inputs keep full precision (TPU default truncates matmul inputs to
    # bf16 — that would silently break the <=1-LSB PIL parity contract on
    # f32 parity runs); the bf16 throughput path keeps the fast default.
    prec = (jax.lax.Precision.HIGHEST
            if img.dtype == jnp.float32 else None)
    y = jnp.einsum("oh,...hwc->...owc", wh, img, precision=prec,
                   preferred_element_type=jnp.float32).astype(img.dtype)
    y = jnp.einsum("pw,...owc->...opc", ww, y, precision=prec,
                   preferred_element_type=jnp.float32).astype(img.dtype)
    return y


def resize_short_side(img: jax.Array, size: int) -> jax.Array:
    """torchvision-``Scale`` resize: short side -> ``size``, aspect preserved.

    Static-shape op: output dims derive from the (static) input dims.
    """
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = scale_short_side_size(h, w, size)
    if (oh, ow) == (h, w):
        return img
    return resize_hw(img, oh, ow)
