"""NMS: IoU-greedy non-max suppression.

Reference: kernels/nms/nms.cu:15 (nms_f32, one O(N^2) IoU pass + greedy
suppression on host order) checked against torchvision.ops.nms
(kernels/nms/nms.py:6,30).

TPU design: scores are sorted at the XLA level (top_k), then ONE Pallas
kernel computes the full IoU matrix on the VPU and runs the inherently
sequential greedy loop with a lax.fori_loop over rows, maintaining the keep
mask as a lane vector. Boxes are passed coordinate-major (4, N) so each
coordinate is a lane vector and the (N, N) IoU matrix comes from
(N,1)x(1,N) broadcasts. Single-block kernel: N <= ~1024 (padded to 128).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import LANES, round_up, use_interpret
from tpukern.core.registry import register


def _nms_keep_kernel(boxes_ref, keep_ref, *, n, iou_threshold):
    b = boxes_ref[...].astype(jnp.float32)      # (4, Np)
    x1, y1, x2, y2 = b[0:1], b[1:2], b[2:3], b[3:4]   # (1, Np) each
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def colv(r):  # (1, Np) -> (Np, 1)
        return r.reshape(-1, 1)

    xx1 = jnp.maximum(colv(x1), x1)
    yy1 = jnp.maximum(colv(y1), y1)
    xx2 = jnp.minimum(colv(x2), x2)
    yy2 = jnp.minimum(colv(y2), y2)
    inter = jnp.maximum(xx2 - xx1, 0.0) * jnp.maximum(yy2 - yy1, 0.0)
    union = colv(area) + area - inter
    iou = inter / jnp.maximum(union, 1e-12)     # (Np, Np)

    Np = iou.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    valid = col_ids < n

    def body(i, keep):
        cur = jax.lax.dynamic_slice(keep, (0, i), (1, 1))[0, 0]
        row = jax.lax.dynamic_slice(iou, (i, 0), (1, Np))
        suppress = (row > iou_threshold) & (col_ids > i) & cur
        return keep & jnp.logical_not(suppress)

    keep0 = valid
    keep = jax.lax.fori_loop(0, n, body, keep0)
    keep_ref[...] = keep.astype(jnp.int32)


def nms(boxes, scores, iou_threshold=0.5, interpret=None):
    """Greedy NMS. boxes (N,4) [x1,y1,x2,y2], scores (N,).

    Returns indices of kept boxes, sorted by descending score, padded with
    -1 to length N (static shape; callers filter >= 0).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    Np = round_up(max(n, 8), LANES)
    b4 = jnp.zeros((8, Np), jnp.float32)  # 8 sublanes (min f32 tile)
    b4 = b4.at[:4, :n].set(boxes_sorted.T)

    keep = pl.pallas_call(
        lambda br, kr: _nms_keep_kernel(br, kr, n=n,
                                        iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret() if interpret is None else interpret,
    )(b4)
    keep = keep[0, :n].astype(bool)
    # compact kept indices to the front (matching nms_ref and the
    # docstring contract), preserving descending-score order
    pos = jnp.argsort(jnp.logical_not(keep), stable=True)
    return jnp.where(keep[pos], order[pos], -1)


def nms_ref(boxes, scores, iou_threshold=0.5):
    """Pure-numpy greedy NMS reference (stands in for torchvision.ops.nms,
    which is not in this environment)."""
    import numpy as np
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64)
    order = np.argsort(-scores)
    keep_flags = np.ones(len(order), bool)
    x1, y1, x2, y2 = boxes.T
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    for a in range(len(order)):
        if not keep_flags[a]:
            continue
        i = order[a]
        for b in range(a + 1, len(order)):
            if not keep_flags[b]:
                continue
            j = order[b]
            xx1, yy1 = max(x1[i], x1[j]), max(y1[i], y1[j])
            xx2, yy2 = min(x2[i], x2[j]), min(y2[i], y2[j])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            union = area[i] + area[j] - inter
            if union > 0 and inter / union > iou_threshold:
                keep_flags[b] = False
    out = np.full(len(order), -1, np.int32)
    kept = order[keep_flags[np.arange(len(order))]]
    out[: len(kept)] = kept
    return out


register("nms", "nms_f32", ref=nms_ref)(nms)
