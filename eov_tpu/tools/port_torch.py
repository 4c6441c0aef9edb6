"""Port torchvision-style ResNet state_dicts into eov_tpu flax variables.

Capability parity: SURVEY.md §5 checkpoint subsystem — the reference consumes
``torchvision.models.resnet50(pretrained=True)``; production use of this
framework loads the same ImageNet checkpoint. The porter is pure numpy: it
accepts any mapping of torch parameter names to arrays (a real
``torch.load`` state_dict, or a test-fixture dict), so it runs without torch
installed.

Layout conversions:
    conv weights  OIHW -> HWIO   (NCHW torch -> NHWC flax)
    linear weight [out, in] -> [in, out]
    BatchNorm     weight/bias -> scale/bias; running stats -> batch_stats
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

__all__ = ["port_resnet_state_dict", "export_resnet_state_dict"]


def _np(x) -> np.ndarray:
    # Accept torch tensors without importing torch.
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(sd, name, consumed=None):
    if consumed is not None:
        consumed.add(name)
    return _np(sd[name]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn(sd, prefix, consumed=None):
    names = (f"{prefix}.weight", f"{prefix}.bias",
             f"{prefix}.running_mean", f"{prefix}.running_var")
    if consumed is not None:
        consumed.update(names)
    return (
        {"scale": _np(sd[names[0]]), "bias": _np(sd[names[1]])},
        {"mean": _np(sd[names[2]]), "var": _np(sd[names[3]])},
    )


def port_resnet_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    bottleneck: bool = True,
    include_fc: bool = False,
    strict: bool = True,
) -> dict:
    """torchvision ResNet state_dict -> flax variables {params, batch_stats}.

    Names map ``layer{i}.{j}.*`` -> ``layer{i}_{j}/*`` and
    ``downsample.0/.1`` -> ``downsample_conv``/``downsample_bn``.

    strict=True refuses a state_dict with leftover parameter keys the target
    arch never consumed — the walk is over the TARGET's structure, so a
    bigger/mismatched donor (resnet34 weights ported as resnet18, resnet50
    as resnet18, ...) would otherwise silently truncate to the blocks the
    target happens to share. torch BN bookkeeping (``num_batches_tracked``)
    and the fc head (fresh by default) are expected leftovers.
    """
    params: dict = {}
    stats: dict = {}
    consumed: set = set()

    params["conv1"] = {"kernel": _conv(state_dict, "conv1.weight", consumed)}
    params["bn1"], stats["bn1"] = _bn(state_dict, "bn1", consumed)

    n_convs = 3 if bottleneck else 2
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            blk_p: dict = {}
            blk_s: dict = {}
            for c in range(1, n_convs + 1):
                blk_p[f"conv{c}"] = {
                    "kernel": _conv(state_dict, f"{t}.conv{c}.weight", consumed)
                }
                blk_p[f"bn{c}"], blk_s[f"bn{c}"] = _bn(
                    state_dict, f"{t}.bn{c}", consumed
                )
            if f"{t}.downsample.0.weight" in state_dict:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(
                        state_dict, f"{t}.downsample.0.weight", consumed
                    )
                }
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _bn(
                    state_dict, f"{t}.downsample.1", consumed
                )
            params[f] = blk_p
            stats[f] = blk_s

    if include_fc and "fc.weight" in state_dict:
        params["fc"] = {
            "kernel": _np(state_dict["fc.weight"]).T,
            "bias": _np(state_dict["fc.bias"]),
        }

    if strict:
        leftover = sorted(
            k for k in state_dict
            if k not in consumed
            and not k.endswith("num_batches_tracked")
            and k not in ("fc.weight", "fc.bias")
        )
        if leftover:
            raise ValueError(
                f"state_dict has {len(leftover)} unconsumed parameter keys "
                f"for this arch (stage_sizes={tuple(stage_sizes)}, "
                f"bottleneck={bottleneck}), e.g. {leftover[:4]} — donor "
                "checkpoint from a different resnet? (strict=False ports "
                "the shared prefix anyway)"
            )

    return {"params": params, "batch_stats": stats}


def export_resnet_state_dict(
    variables: Mapping, stage_sizes: Sequence[int] = (3, 4, 6, 3),
    bottleneck: bool = True,
) -> dict:
    """Inverse port: flax variables -> torchvision-style numpy state_dict.

    Used by the golden parity tests (SURVEY.md §4.1) to drive a torch-CPU
    reference model with identical weights.
    """
    p, s = variables["params"], variables["batch_stats"]
    sd: dict = {}

    def put_conv(name, kernel):
        sd[name] = np.asarray(kernel).transpose(3, 2, 0, 1)  # HWIO -> OIHW

    def put_bn(prefix, bn_p, bn_s):
        sd[f"{prefix}.weight"] = np.asarray(bn_p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(bn_p["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(bn_s["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(bn_s["var"])

    put_conv("conv1.weight", p["conv1"]["kernel"])
    put_bn("bn1", p["bn1"], s["bn1"])
    n_convs = 3 if bottleneck else 2
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            for c in range(1, n_convs + 1):
                put_conv(f"{t}.conv{c}.weight", p[f][f"conv{c}"]["kernel"])
                put_bn(f"{t}.bn{c}", p[f][f"bn{c}"], s[f][f"bn{c}"])
            if "downsample_conv" in p[f]:
                put_conv(f"{t}.downsample.0.weight", p[f]["downsample_conv"]["kernel"])
                put_bn(f"{t}.downsample.1", p[f]["downsample_bn"], s[f]["downsample_bn"])
    if "fc" in p:
        sd["fc.weight"] = np.asarray(p["fc"]["kernel"]).T
        sd["fc.bias"] = np.asarray(p["fc"]["bias"])
    return sd
