"""lpcnet_tpu: a TPU-native LPCNet framework (JAX/XLA/Pallas).

A ground-up re-design of the LPCNet neural vocoder stack (reference:
auliaadila/LPCNet) for TPU hardware: batched-stream synthesis on the MXU,
feature extraction as fused XLA matmuls, functional state, and pjit/mesh
scale-out. Capabilities: analysis/synthesis vocoder, 1.6 kb/s codec, packet
loss concealment (PLC), and DRED RDO-VAE feature redundancy coding.
"""
from . import constants

__version__ = "0.1.0"
