"""Segment sampler unit tests vs an independent Python reference of the TSN rule.

SURVEY.md §4.3: exercise F in {1..300}, K in {3, 8, 25}; assert bounds,
determinism, and distributional correctness of train sampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eov_tpu.data import segments


def _py_center_exact(f: int, k: int) -> np.ndarray:
    # Exact rational floor of tick/2 + tick*x, tick = f/k.
    return np.minimum(
        np.array([(f * (2 * x + 1)) // (2 * k) for x in range(k)]), f - 1
    )


def _py_center_float(f: int, k: int) -> np.ndarray:
    # The TSN-lineage float64 formula as written in TSN-style PyTorch repos.
    tick = f / k
    return np.minimum(
        np.array([int(tick / 2.0 + tick * x) for x in range(k)]), f - 1
    )


@pytest.mark.parametrize("k", [3, 8, 25])
def test_center_matches_exact_reference(k):
    fs = np.array(list(range(1, 301)), np.int32)
    got = np.asarray(segments.center_indices_batch(jnp.asarray(fs), k))
    for i, f in enumerate(fs):
        np.testing.assert_array_equal(
            got[i], _py_center_exact(int(f), k), err_msg=f"F={f} K={k}"
        )


@pytest.mark.parametrize("k", [3, 8, 25])
def test_center_within_one_of_float64_tsn_formula(k):
    # Our exact-integer rule may differ from the float64 TSN formula only on
    # exact-integer boundaries, by at most one frame (see segments.py docs).
    fs = np.array(list(range(1, 301)), np.int32)
    got = np.asarray(segments.center_indices_batch(jnp.asarray(fs), k))
    for i, f in enumerate(fs):
        diff = np.abs(got[i] - _py_center_float(int(f), k))
        assert diff.max() <= 1, f"F={f} K={k}"


@pytest.mark.parametrize("k", [3, 8, 25])
def test_random_in_bounds_and_sorted(k):
    key = jax.random.PRNGKey(0)
    for f in [1, 2, k - 1, k, k + 1, 2 * k, 37, 300]:
        if f < 1:
            continue
        for s in range(5):
            idx = np.asarray(
                segments.random_indices(jax.random.fold_in(key, s), f, k)
            )
            assert idx.shape == (k,)
            assert (idx >= 0).all() and (idx < f).all(), (f, k, idx)
            assert (np.diff(idx) >= 0).all(), f"not sorted: F={f} K={k} {idx}"


def test_random_within_segments_when_long():
    # F >= K: index k must fall inside segment k (TSN train rule).
    k, f = 8, 96
    avg = f // k
    key = jax.random.PRNGKey(1)
    for s in range(20):
        idx = np.asarray(segments.random_indices(jax.random.fold_in(key, s), f, k))
        seg = idx // avg
        np.testing.assert_array_equal(seg, np.arange(k))


def test_random_covers_segment_range():
    # Over many draws, each segment's offsets should span its full duration.
    k, f = 4, 40
    avg = f // k
    key = jax.random.PRNGKey(2)
    all_off = []
    for s in range(300):
        idx = np.asarray(segments.random_indices(jax.random.fold_in(key, s), f, k))
        all_off.append(idx - np.arange(k) * avg)
    offs = np.concatenate(all_off)
    assert offs.min() == 0
    assert offs.max() == avg - 1


def test_batch_forms_match_scalar():
    k = 8
    fs = jnp.array([5, 8, 13, 100, 300], jnp.int32)
    got = np.asarray(segments.center_indices_batch(fs, k))
    for i, f in enumerate(np.asarray(fs)):
        np.testing.assert_array_equal(got[i], np.asarray(segments.center_indices(int(f), k)))

    key = jax.random.PRNGKey(3)
    got_r = np.asarray(segments.random_indices_batch(key, fs, k))
    keys = jax.random.split(key, len(np.asarray(fs)))
    for i, f in enumerate(np.asarray(fs)):
        np.testing.assert_array_equal(
            got_r[i], np.asarray(segments.random_indices(keys[i], int(f), k))
        )


def test_jittable():
    f = jax.jit(lambda n: segments.center_indices(n, 8))
    np.testing.assert_array_equal(np.asarray(f(80)), _py_center_exact(80, 8))
