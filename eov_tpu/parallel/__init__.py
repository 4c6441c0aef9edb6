"""Multi-chip execution: mesh construction, sharded extraction/eval/train.

SURVEY.md §2c: the reference is single-GPU with no distributed runtime; the
TPU-native scale-out story is data-parallel sharding of clip batches and
episode batches over an ICI mesh via shard_map/pjit, with a 'frame' mesh
axis kept open for sharding a clip's segment frames (the long-video analog
of sequence parallelism — one psum-mean collective, §2c SP row).
"""

from eov_tpu.parallel.mesh import make_mesh, DATA_AXIS, FRAME_AXIS

__all__ = ["make_mesh", "DATA_AXIS", "FRAME_AXIS"]
