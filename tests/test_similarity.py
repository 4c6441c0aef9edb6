"""Matcher unit tests vs brute-force numpy references (SURVEY.md §4.3, C8/C9)."""

import numpy as np
import jax.numpy as jnp

from eov_tpu.ops import similarity


def _np_cosine(q, s):
    qn = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    sn = s / np.maximum(np.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
    return qn @ sn.T


def test_cosine_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((7, 32)).astype(np.float32)
    s = rng.standard_normal((5, 32)).astype(np.float32)
    got = np.asarray(similarity.pairwise_scores(jnp.asarray(q), jnp.asarray(s)))
    np.testing.assert_allclose(got, _np_cosine(q, s), rtol=1e-5, atol=1e-6)


def test_euclidean_matches_numpy():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    s = rng.standard_normal((6, 16)).astype(np.float32)
    got = np.asarray(
        similarity.pairwise_scores(jnp.asarray(q), jnp.asarray(s), "euclidean")
    )
    want = -np.array(
        [[np.sum((qi - si) ** 2) for si in s] for qi in q], np.float32
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_vector_normalization_safe():
    q = jnp.zeros((1, 8))
    s = jnp.ones((2, 8))
    out = np.asarray(similarity.pairwise_scores(q, s))
    assert np.isfinite(out).all()


def test_max_fusion_with_mask():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    sup = rng.standard_normal((2, 4, 8)).astype(np.float32)  # N=2, M=4
    mask = np.array([[1, 1, 0, 0], [1, 0, 0, 0]], np.float32)
    got = np.asarray(
        similarity.fused_class_scores(
            jnp.asarray(q), jnp.asarray(sup), jnp.asarray(mask), fusion="max"
        )
    )
    # Brute force: per class, max cos over valid members only.
    for n in range(2):
        valid = sup[n][mask[n] > 0]
        want = _np_cosine(q, valid).max(axis=1)
        np.testing.assert_allclose(got[:, n], want, rtol=1e-5, atol=1e-6)


def test_mean_fusion_prototype():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    sup = rng.standard_normal((2, 3, 8)).astype(np.float32)
    mask = np.array([[1, 1, 1], [1, 1, 0]], np.float32)
    got = np.asarray(
        similarity.fused_class_scores(
            jnp.asarray(q), jnp.asarray(sup), jnp.asarray(mask), fusion="mean"
        )
    )
    protos = np.stack([sup[0].mean(0), sup[1][:2].mean(0)])
    want = _np_cosine(q, protos)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_predict_identifies_identical_support():
    # Query equal to a support member must classify to its class.
    rng = np.random.default_rng(4)
    sup = rng.standard_normal((5, 1, 16)).astype(np.float32)
    q = sup[:, 0, :]  # one query per class, exact match
    preds = np.asarray(similarity.predict(jnp.asarray(q), jnp.asarray(sup)))
    np.testing.assert_array_equal(preds, np.arange(5))


def test_batched_episode_dim():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((3, 4, 8)).astype(np.float32)   # E=3 episodes
    sup = rng.standard_normal((3, 2, 1, 8)).astype(np.float32)
    preds = np.asarray(similarity.predict(jnp.asarray(q), jnp.asarray(sup)))
    assert preds.shape == (3, 4)
    # Each episode independently equals the unbatched result.
    for e in range(3):
        single = np.asarray(
            similarity.predict(jnp.asarray(q[e]), jnp.asarray(sup[e]))
        )
        np.testing.assert_array_equal(preds[e], single)


def test_kshot_mean_fusion_numpy_oracle():
    """K-shot (K>1) prototype-mean fusion vs an independent numpy oracle —
    the CMN-lineage 5-shot rule (kinetics_5shot preset)."""
    rng = np.random.default_rng(6)
    n_way, k, q_n, d = 4, 5, 3, 12
    sup = rng.standard_normal((n_way, k, d)).astype(np.float32)
    q = rng.standard_normal((q_n, d)).astype(np.float32)

    def norm(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    # Oracle: ProtoNet semantics — prototype = raw-feature mean per class,
    # then cosine (matches fused_class_scores' documented 'mean' rule).
    scores = np.einsum("qd,nd->qn", norm(q), norm(sup.mean(axis=1)))
    want = scores.argmax(axis=-1)
    got = np.asarray(
        similarity.predict(
            jnp.asarray(q), jnp.asarray(sup), fusion="mean"
        )
    )
    np.testing.assert_array_equal(got, want)
    # A query whose nearest single member is in the wrong class but whose
    # nearest prototype is right must flip between max and mean fusion.
    proto = np.full((2, 3, 4), 0.0, np.float32)
    proto[0, :, 0] = 1.0                     # class 0: three aligned members
    proto[1] = np.array([[1, 0.05, 0, 0],    # class 1: one near-query outlier
                         [0, -1, 0, 0], [0, -1, 0, 0]], np.float32)
    qq = np.array([[1, 0.1, 0, 0]], np.float32)
    assert np.asarray(similarity.predict(
        jnp.asarray(qq), jnp.asarray(proto), fusion="max"))[0] == 1
    assert np.asarray(similarity.predict(
        jnp.asarray(qq), jnp.asarray(proto), fusion="mean"))[0] == 0
