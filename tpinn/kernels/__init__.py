"""tpinn.kernels — Pallas TPU kernels for the hot compute paths.

The reference has no native code tier (SURVEY §2: pure Python); the
TPU-native equivalent of that obligation is Mosaic-compiled Pallas kernels
for the compute that dominates wall-clock: the fused MLP value+derivative
evaluation behind every residual.
"""

from tpinn.kernels.mlp_taylor import taylor2_mlp_pallas  # noqa: F401
