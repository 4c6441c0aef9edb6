"""Episode sampler invariants: determinism, no overlap, eligibility, uniformity."""

import jax
import numpy as np
import jax.numpy as jnp

from eov_tpu import episodes


def _sample(seed=0, counts=(10, 10, 10, 10, 10, 10), **kw):
    args = dict(n_way=3, k_shot=1, n_query=2, n_episodes=50, max_clips=12)
    args.update(kw)
    return episodes.sample_episodes(
        jax.random.PRNGKey(seed), jnp.asarray(counts, jnp.int32), **args
    )


def test_deterministic():
    a, b = _sample(seed=7), _sample(seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_distinct_classes_within_episode():
    idx = _sample()
    for row in np.asarray(idx.class_ids):
        assert len(set(row.tolist())) == len(row)


def test_support_query_disjoint_and_valid():
    counts = (5, 8, 3, 9, 10)
    idx = _sample(counts=counts, n_way=3, k_shot=1, n_query=2)
    cls = np.asarray(idx.class_ids)
    sup = np.asarray(idx.support_idx)
    qry = np.asarray(idx.query_idx)
    counts = np.asarray(counts)
    for e in range(cls.shape[0]):
        for n in range(cls.shape[1]):
            s = set(sup[e, n].tolist())
            q = set(qry[e, n].tolist())
            assert not (s & q)
            for slot in s | q:
                assert 0 <= slot < counts[cls[e, n]]


def test_ineligible_classes_never_selected():
    counts = (10, 2, 10, 1, 10, 10)  # need k+q = 3
    idx = _sample(counts=counts)
    chosen = set(np.asarray(idx.class_ids).ravel().tolist())
    assert 1 not in chosen and 3 not in chosen


def test_class_selection_roughly_uniform():
    idx = _sample(n_episodes=600, counts=(10,) * 6)
    cls = np.asarray(idx.class_ids).ravel()
    freq = np.bincount(cls, minlength=6) / len(cls)
    # 6 classes, choose 3 -> each appears with p=0.5 per episode.
    np.testing.assert_allclose(freq, 1 / 6, atol=0.02)


def test_query_labels_layout():
    np.testing.assert_array_equal(
        np.asarray(episodes.query_labels(3, 2)), [0, 0, 1, 1, 2, 2]
    )


def test_evaluate_rejects_insufficient_eligible_classes():
    import pytest

    from eov_tpu.eval import EvalConfig, FeatureTable, evaluate

    feats = jnp.zeros((5, 4, 16), jnp.float32)
    counts = jnp.asarray([4, 4, 1, 1, 1], jnp.int32)  # only 2 can host 1+1
    with pytest.raises(ValueError, match="not sampleable"):
        evaluate(FeatureTable(feats, counts),
                 EvalConfig(n_way=3, k_shot=1, n_query=1, n_episodes=4))
