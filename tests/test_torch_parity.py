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


def test_per_stage_activation_parity(shared):
    """Stage-by-stage closeness (stem, layer1..4): localizes porting bugs to
    the first diverging stage instead of a single end-to-end assert
    (SURVEY.md §7 hard part #3)."""
    import torch

    tmodel, variables, _ = shared
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    # torch reference activations via forward hooks
    acts_t = {}
    hooks = [
        tmodel.maxpool.register_forward_hook(
            lambda m, i, o: acts_t.__setitem__("stem", o.detach().numpy())
        )
    ]
    for n in range(1, 5):
        layer = getattr(tmodel, f"layer{n}")
        hooks.append(layer.register_forward_hook(
            lambda m, i, o, n=n: acts_t.__setitem__(
                f"layer{n}", o.detach().numpy())
        ))
    with torch.no_grad():
        tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for h in hooks:
        h.remove()

    model = ResNet50(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    _, inter = model.apply(
        variables, jnp.asarray(x), capture_intermediates=True
    )
    inter = inter["intermediates"]

    def flax_stage(n):
        # last block of stage n, module output (NHWC) -> NCHW
        sizes = {1: 3, 2: 4, 3: 6, 4: 3}
        out = inter[f"layer{n}_{sizes[n] - 1}"]["__call__"][0]
        return np.asarray(out).transpose(0, 3, 1, 2)

    for n in range(1, 5):
        got, ref = flax_stage(n), acts_t[f"layer{n}"]
        assert got.shape == ref.shape, (n, got.shape, ref.shape)
        scale = np.abs(ref).max() + 1e-9
        maxrel = np.abs(got - ref).max() / scale
        assert maxrel < 2e-3, f"stage layer{n} diverges: {maxrel}"


def test_resnet18_parity_basic_blocks():
    """Golden parity for the basic-block family (porter n_convs=2 path)."""
    import torch

    from eov_tpu.models import ResNet18
    from eov_tpu.tools.torch_ref import TorchResNet18, torchvision_style_state_dict

    torch.manual_seed(1)
    tmodel = TorchResNet18().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = torchvision_style_state_dict(tmodel)
    variables = port_torch.port_resnet_state_dict(
        sd, stage_sizes=(2, 2, 2, 2), bottleneck=False
    )
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    model = ResNet18(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 512)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
