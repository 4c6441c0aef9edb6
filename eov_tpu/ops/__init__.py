"""TPU kernels & device-side ops: resize-as-matmul, fused preprocess, similarity."""
