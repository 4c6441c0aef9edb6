"""ResNet backbone shape/dtype smoke tests + param-count check vs torch ResNet-50.

Full activation-level golden parity vs a hand-written torch ResNet-50 with
shared random weights lives in test_torch_parity.py (SURVEY.md §4.1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from eov_tpu.models import ResNet50, resnet50_feature_apply


def _init_small():
    model = ResNet50(num_classes=None, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_feature_shape_and_dtype():
    model, params = _init_small()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply(params, x)
    assert out.shape == (2, 2048)
    assert out.dtype == jnp.float32


def test_param_count_matches_resnet50():
    # torchvision resnet50 (no fc): 23,508,032 parameters.
    _, params = _init_small()
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params["params"]))
    assert n == 23_508_032, n


def test_leading_dims_flattened():
    _, params = _init_small()
    frames = jnp.zeros((2, 3, 64, 64, 3), jnp.float32)  # [B, K, H, W, C]
    feats = resnet50_feature_apply(params, frames, dtype=jnp.float32)
    assert feats.shape == (2, 3, 2048)


def test_batch_consistency():
    # Same input -> same feature regardless of batch packing (BN inference mode).
    _, params = _init_small()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 64, 3))
    single = model_apply = ResNet50(dtype=jnp.float32).apply(params, x[:1])
    batched = ResNet50(dtype=jnp.float32).apply(params, x)
    np.testing.assert_allclose(
        np.asarray(single[0]), np.asarray(batched[0]), rtol=2e-5, atol=2e-5
    )


def test_fold_batchnorm_matches_unfolded():
    """fold_batchnorm: BN-free inference program == BN program (C4 rewrite)."""
    from eov_tpu.models.resnet import fold_batchnorm

    _, params = _init_small()
    rng = np.random.default_rng(3)
    # Perturb BN stats/params so folding is non-trivial (init is identity).
    params = {
        "params": jax.tree.map(
            lambda x: x
            + jnp.asarray(rng.normal(0, 0.05, x.shape).astype(np.float32)),
            params["params"],
        ),
        "batch_stats": jax.tree.map(
            lambda x: jnp.abs(
                x + jnp.asarray(rng.normal(0.1, 0.2, x.shape).astype(np.float32))
            ),
            params["batch_stats"],
        ),
    }
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(resnet50_feature_apply(params, x, dtype=jnp.float32))
    out = np.asarray(
        resnet50_feature_apply(
            fold_batchnorm(params), x, dtype=jnp.float32, folded=True
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - out).max() <= 1e-4 * scale


def test_space_to_depth_stem_matches():
    """stem_s2d: 4x4/s1 conv over 2x2-folded input == 7x7/s2 stem exactly."""
    from eov_tpu.models.resnet import fold_batchnorm, space_to_depth_stem

    _, params = _init_small()
    rng = np.random.default_rng(5)
    params = {
        "params": jax.tree.map(
            lambda x: x
            + jnp.asarray(rng.normal(0, 0.05, x.shape).astype(np.float32)),
            params["params"],
        ),
        "batch_stats": params["batch_stats"],
    }
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(resnet50_feature_apply(params, x, dtype=jnp.float32))
    got = np.asarray(
        resnet50_feature_apply(
            space_to_depth_stem(params), x, dtype=jnp.float32, stem_s2d=True
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() <= 1e-4 * scale
    # composes with fold_batchnorm
    both = fold_batchnorm(space_to_depth_stem(params))
    got2 = np.asarray(
        resnet50_feature_apply(
            both, x, dtype=jnp.float32, stem_s2d=True, folded=True
        )
    )
    assert np.abs(ref - got2).max() <= 2e-4 * scale
