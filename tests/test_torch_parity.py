"""Golden parity: flax ResNet-50 vs independent torch-CPU ResNet-50.

SURVEY.md §4.1 — shared random weights (no network, no pretrained
checkpoints), identical inputs, assert feature closeness. This catches
layout/transposition bugs in both the model and the weight porter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eov_tpu.models import ResNet50
from eov_tpu.tools import port_torch


@pytest.fixture(scope="module")
def shared():
    import torch

    from eov_tpu.tools.torch_ref import TorchResNet50, torchvision_style_state_dict

    torch.manual_seed(0)
    tmodel = TorchResNet50().eval()
    # Perturb BN stats away from (0, 1) so stat porting is actually tested.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = torchvision_style_state_dict(tmodel)
    variables = port_torch.port_resnet_state_dict(sd)
    return tmodel, variables, sd


def test_feature_parity_torch_vs_flax(shared):
    import torch

    tmodel, variables, _ = shared
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    # HIGHEST precision: XLA's default conv path truncates inputs to
    # bf16-level precision even in f32 (measured ~0.25% rel on CPU), which
    # swamps the parity tolerance.
    model = ResNet50(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_state_dict_roundtrip(shared):
    _, variables, sd = shared
    back = port_torch.export_resnet_state_dict(variables)
    assert set(back.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(back[k], np.asarray(sd[k]), err_msg=k)
