"""Op families. Importing this package registers every kernel variant.

One module per op family, mirroring the reference's one-directory-per-op
layout (kernels/<op>/). Each module exposes plain callables plus registry
entries under the family name.
"""

from tpukern.ops import (  # noqa: F401
    elementwise,
    activations,
    reduce,
    dot_product,
    softmax,
    layernorm,
    rmsnorm,
    rope,
    embedding,
    histogram,
    transpose,
    nms,
    gemv,
    matmul,
    matmul_w8a16,
    grouped_matmul,
    attention,
    paged_attention,
    quant,
    cross_entropy,
    sampling,
)
