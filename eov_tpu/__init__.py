"""eov_tpu — TPU-native Embodied One-Shot Video Recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
`lovelyqian/Embodied-One-Shot-Video-Recognition` (ACM MM'19): TSN segment
sampling, ResNet-50 clip features, episodic N-way K-shot evaluation, and
embodied (UnrealAction) support-set augmentation — designed TPU-first.

NOTE on reference citations: the reference mount at /root/reference was empty
at build time (see SURVEY.md §0). Citations in docstrings therefore use the
survey's scheme: `SURVEY.md §N` / `BASELINE.json:N` rather than file:line
into the reference tree.

Layout:
    data/      — decode, segment sampling, transforms, fixtures, class
                 splits, feature store (resumable manifest)
    models/    — flax ResNet family (ARCHS registry) + TSN consensus,
                 BN-fold / space-to-depth inference rewrites
    ops/       — Pallas/XLA kernels: fused preprocess, resize-as-matmul,
                 batched episode similarity
    parallel/  — mesh construction, shard_map extraction/eval, multi-host
    runtime/   — EOVC clip container + native C++ loader binding
    splits/    — checked-in one-shot class splits (C11)
    tools/     — torch weight port, EOVC packer, split generator,
                 accuracy-parity harness
    utils/     — structured metrics, orbax checkpointing
    episodes.py / eval.py / embodied.py / extract.py / train.py — pipelines
"""

__version__ = "0.1.0"
