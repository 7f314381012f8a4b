"""Minimal bench/check drives for families without a dedicated driver
(nms, quant, paged_attention) — used by tools/gen_family_docs.py to
freeze sample logs, runnable standalone too.

Usage: python tools/family_probe.py {nms|quant|paged_attention}
       python tools/family_probe.py --count   # registry census (PARITY.md)
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpukern.harness import pretty_print_line, run_benchmark


def probe_nms():
    from tpukern.ops.nms import nms, nms_ref
    rng = np.random.default_rng(0)
    n = 256
    centers = rng.uniform(0, 100, (n, 2))
    sizes = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
    scores = rng.uniform(0, 1, n)
    bj = jnp.asarray(boxes, jnp.float32)
    sj = jnp.asarray(scores, jnp.float32)
    pretty_print_line(f"nms (n={n}, iou=0.5)")
    r = run_benchmark(jax.jit(lambda b, s: nms(b, s, 0.5)), bj, sj,
                      tag="nms_f32", iters=10)
    out = nms(bj, sj, 0.5)
    ref = nms_ref(boxes, scores, 0.5)
    kept = int((np.asarray(out) >= 0).sum())
    exact = bool((np.asarray(out) == np.asarray(ref)).all())
    print(f"kept {kept}/{n} boxes; exact match vs greedy reference: {exact}")


def probe_quant():
    from tpukern.ops.quant import (dequantize_int8, quantize_int8,
                                   quantize_ref)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4096, 1024)), jnp.float32)
    pretty_print_line("quant int8 per-row (4096x1024 f32)")
    nbytes = x.size * 4 + x.size  # read f32, write int8
    run_benchmark(jax.jit(lambda x: quantize_int8(x)), x,
                  tag="quantize_int8", bytes_moved=nbytes, iters=10)
    run_benchmark(jax.jit(lambda x: quantize_int8(x, stochastic=True,
                                                  seed=7)), x,
                  tag="quantize_int8_stochastic", bytes_moved=nbytes,
                  iters=10)
    v, s = quantize_int8(x)
    run_benchmark(jax.jit(lambda v, s: dequantize_int8(v, s)), v, s,
                  tag="dequantize_int8", bytes_moved=nbytes, iters=10)
    xr = dequantize_int8(v, s)
    v_ref, s_ref = quantize_ref(x)
    err = float(jnp.max(jnp.abs(xr - x)))
    step = float(jnp.max(s)) / 2
    print(f"roundtrip max err {err:.4f} (<= max scale/2 = {step:.4f}); "
          f"values match ref: {bool(jnp.all(jnp.abs(v.astype(jnp.int32) - v_ref.astype(jnp.int32)) <= 1))}")


def probe_paged():
    from tpukern.ops.paged_attention import (paged_attention,
                                             paged_attention_quantized,
                                             paged_attention_ref,
                                             quantize_pages)
    rng = np.random.default_rng(0)
    B, Hq, Hkv, D = 4, 8, 4, 128
    page, P, pages_per_seq = 128, 64, 16
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.bfloat16)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.bfloat16)
    lengths = jnp.asarray([2048, 1500, 700, 2000], jnp.int32)
    table = jnp.asarray(rng.permutation(P)[:B * pages_per_seq],
                        jnp.int32).reshape(B, pages_per_seq)
    nbytes = 2 * B * pages_per_seq * page * D * 2  # K+V pages read
    pretty_print_line(
        f"paged decode (B={B} Hq={Hq} Hkv={Hkv} D={D} page={page} "
        f"pages/seq={pages_per_seq})")
    run_benchmark(jax.jit(lambda q: paged_attention(
        q, k_pages, v_pages, lengths, table)), q,
        tag="paged_decode_bf16", bytes_moved=nbytes, iters=10)
    kq, ks = quantize_pages(k_pages)
    vq, vs = quantize_pages(v_pages)
    run_benchmark(jax.jit(lambda q: paged_attention_quantized(
        q, kq, ks, vq, vs, lengths, table)), q,
        tag="paged_decode_int8kv", bytes_moved=nbytes // 2, iters=10)
    run_benchmark(jax.jit(lambda q: paged_attention_quantized(
        q, kq, ks, vq, vs, lengths, table, q_int8=True)), q,
        tag="paged_decode_int8kv_mxu", bytes_moved=nbytes // 2, iters=10)
    ref = paged_attention_ref(q, k_pages, v_pages, lengths, table)
    for qi in (False, True):
        out = paged_attention_quantized(q, kq, ks, vq, vs, lengths, table,
                                        q_int8=qi)
        print(f"int8-KV (q_int8={qi}) max |diff| vs float reference: "
              f"{float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))):.2e}")


def count_registry():
    """Import every op module and print the live registry census — the
    source of PARITY.md's variant counts."""
    import importlib
    import pkgutil

    import tpukern.ops
    from tpukern.core import registry

    for m in pkgutil.iter_modules(tpukern.ops.__path__):
        importlib.import_module(f"tpukern.ops.{m.name}")
    fams = sorted(registry.families())
    total = 0
    for f in fams:
        n = len(registry.variants(f))
        total += n
        print(f"{f}: {n}")
    print(f"TOTAL: {total} variants across {len(fams)} families")


if __name__ == "__main__":
    if sys.argv[1] == "--count":
        count_registry()
    else:
        {"nms": probe_nms, "quant": probe_quant,
         "paged_attention": probe_paged}[sys.argv[1]]()
