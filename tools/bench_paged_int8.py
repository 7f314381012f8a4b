"""Time paged decode tiers incl. the new pv_int8 all-int8 MXU path.

Same shape as BENCH_NOTES round-2 decode tables: B=8, Hq=8, Hkv=4,
D=128, page=128, 32 pages/seq, lengths 3000-4096, ppb=8.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpukern.harness.bench import device_time
from tpukern.ops.paged_attention import (
    paged_attention, paged_attention_quantized, paged_attention_ref,
    quantize_pages)

rng = np.random.default_rng(0)
B, Hq, Hkv, D = 8, 8, 4, 128
page, pages_per_seq = 128, 32
P = B * pages_per_seq
ppb = 8

q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.float32)
v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)), jnp.float32)
lengths = jnp.asarray(rng.integers(3000, 4097, B), jnp.int32)
table = jnp.asarray(rng.permutation(P), jnp.int32).reshape(B, pages_per_seq)

kb, vb = k_pages.astype(jnp.bfloat16), v_pages.astype(jnp.bfloat16)
kq, ks = quantize_pages(k_pages)
vq, vs = quantize_pages(v_pages)
ref = np.asarray(paged_attention_ref(
    q.astype(jnp.float32), k_pages, v_pages, lengths, table), np.float64)

def err(o):
    return float(np.max(np.abs(np.asarray(o, np.float64) - ref)))

cands = {
    "bf16": functools.partial(paged_attention, q, kb, vb,
                              pages_per_block=ppb),
    "int8_cast": functools.partial(paged_attention_quantized, q, kq, ks,
                                   vq, vs, pages_per_block=ppb),
    "int8_mxu_qk": functools.partial(paged_attention_quantized, q, kq, ks,
                                     vq, vs, pages_per_block=ppb,
                                     q_int8=True),
    "int8_mxu_pv": functools.partial(paged_attention_quantized, q, kq, ks,
                                     vq, vs, pages_per_block=ppb,
                                     pv_int8=True),
    "int8_mxu_full": functools.partial(paged_attention_quantized, q, kq,
                                       ks, vq, vs, pages_per_block=ppb,
                                       q_int8=True, pv_int8=True),
}
for name, fn in cands.items():
    f = lambda lengths, table, fn=fn: fn(lengths=lengths, page_table=table)
    o = f(lengths, table)
    t = device_time(f, lengths, table)
    print(f"{name:16s} {t*1e6:8.1f} us   max|diff| vs f32 ref {err(o):.2e}")
