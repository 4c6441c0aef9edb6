"""Preprocess parity vs PIL — SURVEY.md §4.2 and §7 hard part #1.

PIL resizes uint8 images in two separable passes with fixed-point
coefficients, rounding to uint8 *between* passes and at the output; our path
is the same triangle-filter arithmetic in exact float. Worst-case deviation
from inter-pass rounding is ~2 uint8 LSB (<1% of dynamic range) — bound:
max <= 2 LSB, mean <= 0.5 LSB.
"""

import jax
import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from eov_tpu.ops import preprocess, resize


def _pil_resize(img_u8: np.ndarray, oh: int, ow: int) -> np.ndarray:
    return np.asarray(
        Image.fromarray(img_u8).resize((ow, oh), Image.BILINEAR), np.float32
    )


@pytest.mark.parametrize(
    "h,w", [(240, 320), (360, 480), (256, 256), (480, 360), (112, 200)]
)
def test_resize_short_side_matches_pil(h, w):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    oh, ow = resize.scale_short_side_size(h, w, 256)
    ours = np.asarray(resize.resize_hw(jnp.asarray(img, jnp.float32), oh, ow))
    ref = _pil_resize(img, oh, ow)
    diff = np.abs(ours - ref)
    assert diff.max() <= 2.0, f"max diff {diff.max()}"
    assert diff.mean() <= 0.5, f"mean diff {diff.mean()}"


def test_scale_short_side_size_semantics():
    # torchvision Scale: short side -> size, int() truncation on long side.
    assert resize.scale_short_side_size(240, 320, 256) == (256, int(256 * 320 / 240))
    assert resize.scale_short_side_size(320, 240, 256) == (int(256 * 320 / 240), 256)
    assert resize.scale_short_side_size(256, 900, 256) == (256, 900)  # no-op
    assert resize.scale_short_side_size(256, 256, 256) == (256, 256)


def test_upscale_matches_pil():
    # Upscale path (filterscale = 1, plain bilinear).
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (100, 150, 3), dtype=np.uint8)
    oh, ow = resize.scale_short_side_size(100, 150, 256)
    ours = np.asarray(resize.resize_hw(jnp.asarray(img, jnp.float32), oh, ow))
    ref = _pil_resize(img, oh, ow)
    assert np.abs(ours - ref).max() <= 2.0


def test_weights_rows_sum_to_one():
    for in_s, out_s in [(360, 256), (480, 341), (100, 256), (256, 256)]:
        w = resize.bilinear_weights(in_s, out_s)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)


def test_preprocess_eval_full_chain_vs_pil_numpy():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, 240, 320, 3), dtype=np.uint8)
    got = np.asarray(preprocess.preprocess_eval(jnp.asarray(frames)))
    assert got.shape == (2, 224, 224, 3)

    # Independent PIL + numpy reference.
    for i in range(2):
        oh, ow = resize.scale_short_side_size(240, 320, 256)
        r = _pil_resize(frames[i], oh, ow)
        top, left = (oh - 224) // 2, (ow - 224) // 2
        r = r[top : top + 224, left : left + 224]
        ref = (r / 255.0 - preprocess.IMAGENET_MEAN) / preprocess.IMAGENET_STD
        # 1 uint8 LSB through normalize: 1/(255*std) ~ 0.0175
        assert np.abs(got[i] - ref).max() <= 2.0 / (255 * preprocess.IMAGENET_STD.min())


def test_preprocess_train_geometry_shared_across_clip():
    import jax

    rng = np.random.default_rng(3)
    clip = rng.integers(0, 256, (4, 240, 320, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    out = np.asarray(preprocess.preprocess_train(key, jnp.asarray(clip)))
    assert out.shape == (4, 224, 224, 3)
    # Same geometry for every frame: a constant-valued clip stays constant
    # across frames after any crop/flip.
    const_clip = np.broadcast_to(clip[:1], clip.shape)
    out_c = np.asarray(preprocess.preprocess_train(key, jnp.asarray(const_clip)))
    np.testing.assert_allclose(out_c[0], out_c[-1], atol=1e-6)


def test_multiscale_crop_shapes_and_group_semantics():
    """GroupMultiScaleCrop (C3 train): static output shapes from a 4-scale
    lax.switch, one geometry draw per clip, deterministic per key."""
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.integers(0, 256, (3, 80, 100, 3), dtype=np.uint8))
    outs = []
    for i in range(8):
        out = preprocess.preprocess_train_multiscale(
            jax.random.PRNGKey(i), clip, scale_size=72, crop_size=64
        )
        assert out.shape == (3, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()
        again = preprocess.preprocess_train_multiscale(
            jax.random.PRNGKey(i), clip, scale_size=72, crop_size=64
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(again))
        outs.append(np.asarray(out))
    # different keys -> different crops (augmentation actually varies)
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])

    # vmapped+jitted exactly as train.py uses it
    f = jax.jit(jax.vmap(
        lambda kk, c: preprocess.preprocess_train_multiscale(
            kk, c, scale_size=72, crop_size=64
        )
    ))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    clips = jnp.asarray(
        rng.integers(0, 256, (4, 3, 80, 100, 3), dtype=np.uint8)
    )
    assert f(keys, clips).shape == (4, 3, 64, 64, 3)


def test_preprocess_eval_bf16_close_to_f32():
    """The TPU throughput path (bf16 resize/normalize) stays within bf16
    rounding of the f32 parity path."""
    rng = np.random.default_rng(7)
    frames = jnp.asarray(
        rng.integers(0, 256, (4, 100, 73, 3), dtype=np.uint8)
    )
    f32 = np.asarray(
        preprocess.preprocess_eval(frames, scale_size=96, crop_size=64)
    )
    bf16 = np.asarray(
        preprocess.preprocess_eval(
            frames, scale_size=96, crop_size=64, dtype=jnp.bfloat16
        ).astype(jnp.float32)
    )
    assert np.abs(f32 - bf16).max() < 0.1  # values span ~[-2.6, 2.6]
