"""tpukern — a TPU-native Pallas kernel library.

A from-scratch rebuild of the capabilities of DefTruth/CUDA-Learn-Notes
(reference: /root/reference) as idiomatic JAX/Pallas for TPU:

- a graded kernel zoo (elementwise/activations, reductions, softmax incl.
  online softmax, layer-norm/RMS-norm, RoPE, embedding, histogram,
  transpose, NMS, GEMV),
- a multi-variant BF16/F32 matmul ladder (naive -> K-sliced -> pipelined ->
  grid-swizzled MXU tiles) standing in for the reference's toy-hgemm
  (reference: kernels/hgemm/),
- a FlashAttention-2 forward family (split-Q tiling, fused online softmax)
  standing in for flash-attention-mma (reference: kernels/flash-attn/),
- an ICI collectives module + ring attention (the reference's distributed
  placeholders, made real for TPU meshes).

Every kernel variant is registered in `tpukern.core.registry` and checked
against an XLA reference at dtype-matched tolerance.
"""

from tpukern.core import registry
from tpukern.core.config import use_interpret

__version__ = "0.1.0"

__all__ = ["registry", "use_interpret", "__version__"]
