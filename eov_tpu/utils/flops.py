"""Analytic forward-FLOPs model for the ResNet backbones.

The bench's sanity rail (DESIGN.md §8 rule 3) divides measured step time by
per-step FLOPs to check throughput against the hardware peak. HLO
``cost_analysis`` is the primary source, but it is best-effort (the axon
PJRT tunnel and Pallas custom calls can both break it — BENCH_r01.json
shipped nulls, VERDICT r1 weak #4), so this module computes the conv/fc
FLOPs straight from the architecture spec as the always-available fallback.

Convention: 2 FLOPs per MAC (XLA's cost-analysis convention), convolutions
and the fc head only — BN/ReLU/pool elementwise work is O(activations) and
<1% of a ResNet forward. resnet50 @ 224x224 evaluates to 8.21 GFLOP/image
(the familiar 4.1 GMACs).
"""

from __future__ import annotations

__all__ = ["resnet_forward_flops"]


def _conv_out(size: int, kernel: int, stride: int, pad: int) -> int:
    return (size + 2 * pad - kernel) // stride + 1


def resnet_forward_flops(
    arch: str = "resnet50",
    hw: tuple[int, int] = (224, 224),
    *,
    num_classes: int | None = None,
    width: int = 64,
) -> int:
    """Forward conv(+fc) FLOPs for ONE image through the backbone.

    Mirrors models/resnet.py exactly: 7x7/s2 stem (pad 3), 3x3/s2 maxpool
    (pad 1), then the stage_sizes of bottleneck (1x1 -> 3x3-with-stride ->
    1x1, 1x1 downsample) or basic (3x3-with-stride -> 3x3, 1x1 downsample)
    blocks; global average pool; optional fc.
    """
    from eov_tpu.models import get_arch

    _, stage_sizes, bottleneck = get_arch(arch)
    h, w = hw
    flops = 0

    def add_conv(h, w, in_c, out_c, k, s, pad):
        nonlocal flops
        oh = _conv_out(h, k, s, pad)
        ow = _conv_out(w, k, s, pad)
        flops += 2 * oh * ow * out_c * k * k * in_c
        return oh, ow

    # Stem.
    h, w = add_conv(h, w, 3, width, 7, 2, 3)
    h, w = _conv_out(h, 3, 2, 1), _conv_out(w, 3, 2, 1)  # maxpool

    c = width
    for i, n_blocks in enumerate(stage_sizes):
        f = width * 2**i
        out_c = f * 4 if bottleneck else f
        for j in range(n_blocks):
            s = 2 if i > 0 and j == 0 else 1
            if bottleneck:
                add_conv(h, w, c, f, 1, 1, 0)            # conv1 (input res)
                h2 = _conv_out(h, 3, s, 1)
                w2 = _conv_out(w, 3, s, 1)
                flops += 2 * h2 * w2 * f * 9 * f          # conv2 (stride)
                flops += 2 * h2 * w2 * out_c * 1 * f      # conv3
            else:
                h2 = _conv_out(h, 3, s, 1)
                w2 = _conv_out(w, 3, s, 1)
                flops += 2 * h2 * w2 * f * 9 * c          # conv1 (stride)
                flops += 2 * h2 * w2 * f * 9 * f          # conv2
            if c != out_c or s != 1:
                flops += 2 * h2 * w2 * out_c * 1 * c      # downsample
            h, w, c = h2, w2, out_c

    if num_classes is not None:
        flops += 2 * c * num_classes
    return flops
