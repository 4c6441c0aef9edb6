"""TSN segment sampling — pure, jittable index math.

Capability parity: reference component C2 (SURVEY.md §2a) — the TSN-lineage
segment sampler (`_sample_indices` / `_get_test_indices` in TSN-style
PyTorch repos). Re-derived from the TSN sampling definition, implemented as
pure functions over int32 scalars so they vmap/jit cleanly on TPU:

* A clip with ``num_frames`` frames is divided into ``num_segments`` (K)
  equal-duration segments.
* Train mode: one frame uniformly at random *within* each segment.
* Test/center mode: the center frame of each segment (deterministic).

Unlike the host-side Python loop in the reference, these run inside jit so a
whole batch of clips (with per-clip frame counts) can be index-sampled
on-device in one fused op, feeding a gather from a frame store.

Edge cases follow the TSN convention:
* ``num_frames >= num_segments``: per-segment sampling as above.
* ``num_frames < num_segments``: indices repeat (clamped), never OOB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "center_indices",
    "random_indices",
    "center_indices_batch",
    "random_indices_batch",
    "center_indices_np",
]


def center_indices(num_frames: jax.Array | int, num_segments: int) -> jax.Array:
    """Deterministic test-time indices: the center frame of each of K segments.

    Equivalent to the TSN test-time rule
    ``offsets[k] = floor(tick / 2 + tick * k)`` with
    ``tick = num_frames / K``, clamped to be in-range for short clips.

    Implemented as exact integer arithmetic ``(F * (2k+1)) // (2K)``. This is
    the mathematically exact floor; the float64 formula in TSN-lineage repos
    rounds down one frame earlier in the rare case where ``F*(2k+1)/(2K)`` is
    an exact integer and float64 error lands at ``n - ulp`` (e.g. F=30, K=25,
    k=12). Deviation is at most one frame index, only on those exact ties.

    Args:
        num_frames: scalar (traced ok) total frame count F >= 1.
        num_segments: static K >= 1.

    Returns:
        int32 array of shape (K,), values in [0, F).
    """
    # floor(tick/2 + tick*k) with tick = F/K equals (F*(2k+1)) // (2K) — exact
    # integer arithmetic, no float32 rounding drift vs the float64 reference.
    f = jnp.asarray(num_frames, jnp.int32)
    k = jnp.arange(num_segments, dtype=jnp.int32)
    idx = (f * (2 * k + 1)) // (2 * num_segments)
    return jnp.clip(idx, 0, f - 1)


def random_indices(
    key: jax.Array, num_frames: jax.Array | int, num_segments: int
) -> jax.Array:
    """Train-time indices: one uniform frame inside each of K segments.

    For F >= K this matches the TSN train rule
    ``offsets[k] = k * (F // K) + U{0, F//K - 1}``.
    For F < K it falls back to sorted uniform indices with repetition
    (the reference's "loop the short clip" behavior), implemented branch-free.

    Args:
        key: PRNG key.
        num_frames: scalar frame count F >= 1 (traced ok).
        num_segments: static K.

    Returns:
        int32 (K,) sorted, in [0, F).
    """
    f = jnp.asarray(num_frames, jnp.int32)
    k = jnp.arange(num_segments, dtype=jnp.int32)

    avg = f // num_segments  # segment duration (0 when F < K)
    u = jax.random.uniform(key, (num_segments,))
    # Within-segment uniform offset; avg==0 degenerates to offset 0.
    within = (u * jnp.maximum(avg, 1).astype(jnp.float32)).astype(jnp.int32)
    long_case = k * avg + jnp.minimum(within, jnp.maximum(avg - 1, 0))
    # Short-clip fallback: K sorted uniform draws over [0, F).
    short_case = jnp.sort((u * f.astype(jnp.float32)).astype(jnp.int32))
    idx = jnp.where(avg > 0, long_case, short_case)
    return jnp.clip(idx, 0, f - 1)


def center_indices_batch(num_frames: jax.Array, num_segments: int) -> jax.Array:
    """Vectorized `center_indices` over a batch of frame counts (B,) -> (B, K)."""
    return jax.vmap(lambda f: center_indices(f, num_segments))(num_frames)


def random_indices_batch(
    key: jax.Array, num_frames: jax.Array, num_segments: int
) -> jax.Array:
    """Vectorized `random_indices`: (B,) frame counts -> (B, K) indices."""
    keys = jax.random.split(key, num_frames.shape[0])
    return jax.vmap(lambda kk, f: random_indices(kk, f, num_segments))(
        keys, num_frames
    )


def center_indices_np(num_frames: int, num_segments: int):
    """Host-side (numpy) twin of `center_indices` — the ONE mirror.

    Decode paths sample indices on host before frames exist on device;
    this is the same exact integer rule, kept here so extract/train/eval
    host loops cannot drift from the jittable definition (the jax twin is
    property-tested against the TSN formula in tests/test_segments.py).
    """
    import numpy as np

    k = num_segments
    idx = (num_frames * (2 * np.arange(k) + 1)) // (2 * k)
    return np.minimum(idx, num_frames - 1)
