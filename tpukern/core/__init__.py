"""Core: shared tiling math, tolerances, variant registry, config.

The reference duplicates its device-primitive prelude into every .cu file
(e.g. kernels/elementwise/elementwise.cu:13-18 vs kernels/reduce/
block_all_reduce.cu:13-18). Here there is exactly ONE shared core module.
"""

from tpukern.core.tiling import (
    LANES,
    cdiv,
    round_up,
    min_sublanes,
    min_tile,
    as_rows,
    from_rows,
    pad_to_multiple_2d,
)
from tpukern.core.tolerances import tol, check_all_close
from tpukern.core.registry import register, get, variants, families, Variant
from tpukern.core.config import (
    use_interpret,
    kernel_dtype,
    to_kernel_dtype,
    STORAGE_ONLY_DTYPES,
)

__all__ = [
    "LANES",
    "cdiv",
    "round_up",
    "min_sublanes",
    "min_tile",
    "as_rows",
    "from_rows",
    "pad_to_multiple_2d",
    "tol",
    "check_all_close",
    "register",
    "get",
    "variants",
    "families",
    "Variant",
    "use_interpret",
    "kernel_dtype",
    "to_kernel_dtype",
    "STORAGE_ONLY_DTYPES",
]
