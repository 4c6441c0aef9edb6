"""Pallas matcher parity vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from eov_tpu.ops import similarity
from eov_tpu.ops import pallas_similarity as psim


def _data(e=4, q=10, n=5, m=3, d=256, seed=0):
    rng = np.random.default_rng(seed)
    query = rng.standard_normal((e, q, d)).astype(np.float32)
    support = rng.standard_normal((e, n, m, d)).astype(np.float32)
    mask = (rng.random((e, n, m)) > 0.3).astype(np.float32)
    mask[..., 0] = 1.0  # every class keeps at least one member
    return jnp.asarray(query), jnp.asarray(support), jnp.asarray(mask)


@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
@pytest.mark.parametrize("fusion", ["max", "mean"])
def test_pallas_matches_xla(metric, fusion):
    query, support, mask = _data()
    ref = np.asarray(
        similarity.fused_class_scores(
            query, support, mask, metric=metric, fusion=fusion
        )
    )
    got = np.asarray(
        psim.episode_class_scores(
            query, support, mask, metric=metric, fusion=fusion, interpret=True
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_pallas_predictions_match(seed=1):
    query, support, mask = _data(e=6, q=8, n=5, m=2, d=128, seed=seed)
    ref = np.asarray(similarity.predict(query, support, mask))
    got = np.asarray(psim.episode_predict(query, support, mask, interpret=True))
    # Scores agree to ~1e-3; predictions may differ only on exact ties,
    # which have measure zero for random continuous features.
    np.testing.assert_array_equal(got, ref)


def test_pallas_odd_shapes():
    # Q and M not multiples of the tile sizes.
    query, support, mask = _data(e=2, q=5, n=4, m=1, d=128, seed=2)
    ref = np.asarray(similarity.fused_class_scores(query, support, mask))
    got = np.asarray(
        psim.episode_class_scores(query, support, mask, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_pallas_rejects_bad_feature_dim():
    query, support, mask = _data(d=200)
    with pytest.raises(ValueError):
        psim.episode_class_scores(query, support, mask, interpret=True)
