"""Parallelism layer: ICI collectives + ring attention over TPU meshes.

The reference intends a distributed layer but never implements it: ten
0-byte placeholder files name the collective set
(others/pytorch/distributed/test_{p2p,broadcast,scatter,gather,reduce,
all_reduce,all_gather,all_gather_objects,reduce_scatter,all_to_all}.py) —
see SURVEY.md §2.5. Here they are real, built over shard_map + XLA
collectives riding ICI, plus ring attention (the context-parallel extension
of the FA-2 kernel the reference's split-Q tiling anticipates).
"""

from tpukern.parallel.collectives import (
    p2p,
    broadcast,
    scatter,
    gather,
    reduce,
    all_reduce,
    all_gather,
    all_gather_object,
    reduce_scatter,
    all_to_all,
)
from tpukern.parallel.ring_attention import ring_attention
from tpukern.parallel.ulysses import ulysses_attention
from tpukern.parallel.collective_matmul import (
    all_gather_matmul,
    matmul_reduce_scatter,
    tp_mlp,
)

__all__ = [
    "p2p", "broadcast", "scatter", "gather", "reduce", "all_reduce",
    "all_gather", "all_gather_object", "reduce_scatter", "all_to_all",
    "ring_attention",
    "ulysses_attention",
    "all_gather_matmul", "matmul_reduce_scatter", "tp_mlp",
]
