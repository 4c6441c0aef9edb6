"""Model registry — flax ResNet family (NHWC, TPU-first)."""

from eov_tpu.models.resnet import (
    ResNet,
    ResNet18,
    ResNet34,
    ResNet50,
    ResNet101,
    ResNet152,
    feature_apply,
    fold_batchnorm,
    resnet50_feature_apply,
    space_to_depth_stem,
)

# Architecture registry: name -> (constructor, stage_sizes, bottleneck).
# Used by extract/CLI --arch and the torch weight porter.
ARCHS = {
    "resnet18": (ResNet18, (2, 2, 2, 2), False),
    "resnet34": (ResNet34, (3, 4, 6, 3), False),
    "resnet50": (ResNet50, (3, 4, 6, 3), True),
    "resnet101": (ResNet101, (3, 4, 23, 3), True),
    "resnet152": (ResNet152, (3, 8, 36, 3), True),
}


def get_arch(name: str):
    if name not in ARCHS:
        raise KeyError(f"unknown arch '{name}'; have {sorted(ARCHS)}")
    return ARCHS[name]


__all__ = [
    "ARCHS",
    "get_arch",
    "feature_apply",
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNet101",
    "ResNet152",
    "fold_batchnorm",
    "resnet50_feature_apply",
    "space_to_depth_stem",
]
