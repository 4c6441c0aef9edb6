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


def test_multiscale_crop_matches_tsn_recipe():
    """Full TSN GroupMultiScaleCrop fidelity (VERDICT r1 #4): the candidate
    (h, w) pair set (incl. aspect distortion, |i-j|<=1, 3px snapping) and
    the 13 fix_crop/more_fix_crop offsets match the TSN formulas, checked
    against an independent transcription of the recipe."""
    h, w, crop = 72, 90, 64

    # Independent oracle of TSN _sample_crop_size + fill_fix_offset.
    scales = [1.0, 0.875, 0.75, 0.66]
    base = min(w, h)
    crop_sizes = [int(base * s) for s in scales]
    snap = [crop if abs(c - crop) < 3 else c for c in crop_sizes]
    want_pairs = [
        (snap[i], snap[j])
        for i in range(4)
        for j in range(4)
        if abs(i - j) <= 1
    ]
    got_pairs = preprocess._ms_crop_pairs(h, w, crop)
    assert got_pairs == want_pairs
    assert len(got_pairs) == 10
    assert any(ch != cw for ch, cw in got_pairs)  # distorted pairs present

    def tsn_fill_fix_offset(image_w, image_h, crop_w, crop_h):
        w_step = (image_w - crop_w) // 4
        h_step = (image_h - crop_h) // 4
        ret = [(0, 0), (4 * w_step, 0), (0, 4 * h_step),
               (4 * w_step, 4 * h_step), (2 * w_step, 2 * h_step),
               (0, 2 * h_step), (4 * w_step, 2 * h_step),
               (2 * w_step, 4 * h_step), (2 * w_step, 0),
               (1 * w_step, 1 * h_step), (3 * w_step, 1 * h_step),
               (1 * w_step, 3 * h_step), (3 * w_step, 3 * h_step)]
        return ret

    for ch, cw in got_pairs:
        tops, lefts = preprocess._ms_fix_offsets(h - ch, w - cw)
        want = tsn_fill_fix_offset(w, h, cw, ch)  # TSN order: (w_off, h_off)
        assert list(zip(lefts, tops)) == want, (ch, cw)


def test_multiscale_crop_distorted_branches_execute():
    """Every (pair, offset) branch yields a finite crop-sized output."""
    rng = np.random.default_rng(3)
    clip = jnp.asarray(rng.integers(0, 256, (2, 72, 90, 3), dtype=np.uint8))
    shapes = set()
    for i in range(40):  # enough keys to hit distorted pairs w.h.p.
        out = preprocess.preprocess_train_multiscale(
            jax.random.PRNGKey(100 + i), clip, scale_size=72, crop_size=64
        )
        assert out.shape == (2, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()
        shapes.add(out.shape)
    assert shapes == {(2, 64, 64, 3)}


def test_multiscale_gathered_matches_switch_oracle():
    """The production gathered-weights GroupMultiScaleCrop (one resize with
    pair-gathered PIL-exact matrices) == the lax.switch semantics oracle,
    per key, to f32 rounding — including identity (crop==pair) branches,
    distorted pairs, and all 13 offsets (r3 rewrite: the switch executes
    every branch under vmap)."""
    rng = np.random.default_rng(11)
    clip = jnp.asarray(rng.integers(0, 256, (2, 72, 90, 3), dtype=np.uint8))
    for i in range(40):
        key = jax.random.PRNGKey(i)
        fast = np.asarray(preprocess.preprocess_train_multiscale(
            key, clip, scale_size=72, crop_size=64
        ))
        oracle = np.asarray(preprocess.preprocess_train_multiscale_switch(
            key, clip, scale_size=72, crop_size=64
        ))
        np.testing.assert_allclose(fast, oracle, atol=2e-5, err_msg=f"key {i}")

    # And under jit+vmap (how train.py consumes it).
    f = jax.jit(jax.vmap(
        lambda kk, c: preprocess.preprocess_train_multiscale(
            kk, c, scale_size=72, crop_size=64
        )
    ))
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    clips = jnp.asarray(
        rng.integers(0, 256, (6, 2, 72, 90, 3), dtype=np.uint8)
    )
    batched = np.asarray(f(keys, clips))
    for j in range(6):
        oracle = np.asarray(preprocess.preprocess_train_multiscale_switch(
            keys[j], clips[j], scale_size=72, crop_size=64
        ))
        np.testing.assert_allclose(batched[j], oracle, atol=2e-5)


def test_maxpool_decomposition_matches_reduce_window():
    """ops/pool.py rewrites == reduce_window(max): strided-slice variant on
    inputs >= 0, separable variant unconditionally."""
    import jax.lax as lax

    from eov_tpu.ops.pool import (
        maxpool_3x3_s2_nonneg, maxpool_3x3_s2_separable,
    )

    rng = np.random.default_rng(7)
    for shape, dtype in [
        ((2, 112, 112, 8), np.float32),
        ((1, 13, 17, 4), np.float32),
        ((3, 8, 8, 3), np.float32),
        ((2, 56, 56, 16), jnp.bfloat16),
    ]:
        x = jnp.asarray(rng.random(shape, np.float32)).astype(dtype)  # >= 0
        ref = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        got = maxpool_3x3_s2_nonneg(x)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32)
        )
        sep = maxpool_3x3_s2_separable(x - 0.5)  # sign-free: shift negative
        ref2 = lax.reduce_window(
            x - 0.5, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        np.testing.assert_array_equal(
            np.asarray(sep, np.float32), np.asarray(ref2, np.float32)
        )
