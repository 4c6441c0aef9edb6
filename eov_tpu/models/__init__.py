"""Model layer: flax ResNet backbones + TSN segment consensus."""

from eov_tpu.models.resnet import ResNet, ResNet50, resnet50_feature_apply

__all__ = ["ResNet", "ResNet50", "resnet50_feature_apply"]
