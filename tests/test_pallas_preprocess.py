"""Pallas crop+normalize kernel parity vs the XLA preprocess path."""

import numpy as np
import pytest
import jax.numpy as jnp

from eov_tpu.ops import preprocess
from eov_tpu.ops.pallas_preprocess import crop_normalize


@pytest.mark.parametrize("h,w,crop", [(256, 320, 224), (64, 80, 48)])
def test_matches_xla_path(h, w, crop):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 3, h, w, 3), dtype=np.uint8)
    want = np.asarray(
        preprocess.normalize(
            preprocess.center_crop(jnp.asarray(frames, jnp.float32), crop)
        )
    )
    got = np.asarray(
        crop_normalize(jnp.asarray(frames), crop=crop, dtype=jnp.float32,
                       interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bf16_output_close():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (4, 64, 72, 3), dtype=np.uint8)
    want = np.asarray(
        preprocess.normalize(
            preprocess.center_crop(jnp.asarray(frames, jnp.float32), 48)
        )
    )
    got = np.asarray(
        crop_normalize(jnp.asarray(frames), crop=48, dtype=jnp.bfloat16,
                       interpret=True)
    ).astype(np.float32)
    # bf16 storage rounding only (values in [-2.7, 2.7]).
    np.testing.assert_allclose(got, want, atol=0.02)


def test_rejects_small_frames():
    with pytest.raises(ValueError):
        crop_normalize(jnp.zeros((1, 32, 32, 3), jnp.uint8), crop=224,
                       interpret=True)


def test_grouped_crop_kernel_bit_identical():
    """group>1 (multi-frame grid steps) is bit-identical to group=1, and
    non-divisible frame counts degrade to 1."""
    rng = np.random.default_rng(8)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, 4, 40, 48, 3), dtype=np.uint8)
    )
    a = np.asarray(crop_normalize(frames, crop=32, group=1, interpret=True))
    b = np.asarray(crop_normalize(frames, crop=32, group=4, interpret=True))
    np.testing.assert_array_equal(a, b)
    odd = frames[:, :3]  # 6 frames, group 4 -> degrade to 1
    c = np.asarray(crop_normalize(odd, crop=32, group=4, interpret=True))
    d = np.asarray(crop_normalize(odd, crop=32, group=1, interpret=True))
    np.testing.assert_array_equal(c, d)
