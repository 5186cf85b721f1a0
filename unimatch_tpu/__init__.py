"""unimatch_tpu — a TPU-native (JAX / XLA / Pallas) dense-matching framework.

A from-scratch rebuild of the capabilities of autonomousvision/unimatch
("Unifying Flow, Stereo and Depth Estimation", TPAMI 2023): one weight-sharing
model that solves optical flow, rectified-stereo disparity and two-view posed
depth as dense matching — CNN features, transformer enhancement (self + cross
attention), correlation/cost volumes, differentiable softmax-argmax readout,
optional hierarchical matching, self-attention propagation, and ConvGRU
regression refinement.

Design (TPU-first, not a port):
  * NHWC layout everywhere (TPU conv layout), functional flax.linen modules.
  * Static-shape, trace-once forward; task dispatch is static.
  * Fused Pallas kernels for the hot paths (blockwise correlation softmax
    + expectation that never materializes the full cost volume in HBM).
  * Scaling via jax.sharding Mesh + NamedSharding (data parallel over ICI),
    not NCCL translation.
"""

from unimatch_tpu.config import ModelConfig, InferenceConfig

__version__ = "0.1.0"

__all__ = ["UniMatch", "ModelConfig", "InferenceConfig", "__version__"]


def __getattr__(name):
    # lazy import to keep `import unimatch_tpu.ops` cheap and cycle-free
    if name == "UniMatch":
        from unimatch_tpu.models.unimatch import UniMatch

        return UniMatch
    raise AttributeError(name)
