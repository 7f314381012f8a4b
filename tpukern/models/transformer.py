"""Flagship model: a llama-style decoder built ON the tpukern kernels.

The reference has no model layer (kernels/transformer/ is an empty
placeholder directory). This module fills that placeholder the TPU way: a
causal transformer whose hot path runs the library's Pallas kernels —
flash_attention (split-Q FA-2), matmul (MXU GEMM ladder), rms_norm, rope —
each made differentiable via the custom-VJP wrappers in ops/trainable.py.

Parallelism: explicit SPMD via shard_map on a ("dp", "tp"[, "sp"]) mesh —
- dp: batch sharded; gradients psum over dp,
- tp: attention heads + MLP hidden sharded (Megatron-style column/row
  splits); row-split outputs psum over tp,
- sp (optional): activations sharded over the sequence dim for embedding,
  norms, MLP and the loss (Megatron sequence parallelism); the attention
  block all-gathers tokens over sp and each shard keeps its slice of the
  output,
- replicated params' grads psum over every mesh axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpukern.ops.attention import flash_attention
from tpukern.ops.trainable import (
    flash_attention_trainable,
    matmul_t,
    rms_norm_t,
    rope_t,
)


@dataclasses.dataclass(frozen=True)
class Config:
    vocab: int = 2048
    d_model: int = 256
    n_layers: int = 2
    n_heads: int = 8
    n_kv_heads: int = 4
    d_ff: int = 1024
    max_seq: int = 256
    param_dtype: Any = jnp.float32
    # mixture-of-experts FFN (models/moe.py): n_experts == 0 keeps the
    # dense MLP; > 0 replaces every layer's MLP with a top-k routed,
    # capacity-dispatched MoE whose experts shard over an "ep" mesh axis
    n_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 2.0
    # fused LM-head loss (ops/cross_entropy.py): compute the CE directly
    # from the pre-head hidden states without materializing the
    # (B, S, vocab) logits tensor — the (N, V) slab never touches HBM
    fused_loss: bool = False
    # activation rematerialization (jax.checkpoint around each layer):
    # recompute intra-layer activations in the backward pass instead of
    # storing them — O(sqrt) activation memory for deep stacks
    remat: bool = False
    # attention flavor knobs, trainable end-to-end (featured Pallas
    # forward AND backward kernels): mistral-style sliding window and
    # Gemma-style logit softcap
    window: Any = None
    softcap: Any = None
    # StreamingLLM attention sinks (requires window): the first `sinks`
    # positions stay visible to every query. Inference-only — forward()
    # and the serving stack honor it; the training step rejects it (the
    # backward kernels don't carry the sink mask).
    sinks: Any = None
    # all-int8 MXU serving decode (int8 KV pools only): also run the PV
    # matmul s8s8s32 by quantizing the softmax row on-chip against the
    # raw int8 V pages — no (bk, D) V dequant cast. Adds ~7-bit p
    # resolution on top of the int8-KV tolerance (BENCH_NOTES).
    pv_int8: bool = False

    @property
    def head_dim(self):
        return self.d_model // self.n_heads


def init_params(cfg: Config, key):
    keys = iter(jax.random.split(key, 4 + 8 * cfg.n_layers))
    dt = cfg.param_dtype

    def w(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape) * scale).astype(dt)

    Dh = cfg.head_dim
    layers = []
    for _ in range(cfg.n_layers):
        layer = dict(
            ln1=jnp.ones((cfg.d_model,), dt),
            wq=w((cfg.d_model, cfg.n_heads * Dh)),
            wk=w((cfg.d_model, cfg.n_kv_heads * Dh)),
            wv=w((cfg.d_model, cfg.n_kv_heads * Dh)),
            wo=w((cfg.n_heads * Dh, cfg.d_model)),
            ln2=jnp.ones((cfg.d_model,), dt),
        )
        if cfg.n_experts:
            from tpukern.models.moe import init_moe_params
            layer["moe"] = init_moe_params(
                next(keys), cfg.d_model, cfg.d_ff, cfg.n_experts, dtype=dt)
        else:
            layer.update(w1=w((cfg.d_model, cfg.d_ff)),
                         w2=w((cfg.d_ff, cfg.d_model)))
        layers.append(layer)
    return dict(
        embed=w((cfg.vocab, cfg.d_model)),
        layers=layers,
        lnf=jnp.ones((cfg.d_model,), dt),
        head=w((cfg.d_model, cfg.vocab)),
    )


def param_specs(cfg: Config, ep: bool = False):
    """PartitionSpecs for the ("dp", "tp"[, "sp"][, "ep"]) mesh: Megatron
    column/row splits; MoE experts shard over "ep" when the mesh has it."""
    layer = dict(
        ln1=P(), ln2=P(),
        wq=P(None, "tp"), wk=P(None, "tp"), wv=P(None, "tp"),
        wo=P("tp", None),
    )
    if cfg.n_experts:
        e = "ep" if ep else None
        layer["moe"] = dict(router=P(), w1=P(e, None, None),
                            w2=P(e, None, None))
    else:
        layer.update(w1=P(None, "tp"), w2=P("tp", None))
    return dict(embed=P(), layers=[dict(layer) for _ in range(cfg.n_layers)],
                lnf=P(), head=P())


# tp gradient semantics under shard_map(check_vma=False): with replication
# tracking off, the transpose of lax.psum is psum, so the (tp-replicated)
# cotangent flowing into a row-split output psum would pick up a spurious
# xTP factor contaminating every upstream gradient. The two custom-VJP
# markers in parallel/spmd_grads implement the semantics check_vma=True's
# pbroadcast/pvary pair would give; with both in place every gradient is
# exact on every device at any depth.
from tpukern.parallel.spmd_grads import (  # noqa: E402
    enter_varying as _enter_varying,
    psum_invariant as _psum_invariant,
)


def _attn_block(h, lp, cfg: Config, tp_size: int, tp_axis, sp_axis=None):
    if tp_axis is not None:
        h = _enter_varying(h, tp_axis)
    if sp_axis is not None:
        # sequence parallelism: gather tokens for attention; every sp
        # member computes the full-sequence attention and keeps its slice
        h = lax.all_gather(h, sp_axis, axis=1, tiled=True)
    B, S, d = h.shape
    Dh = cfg.head_dim
    hq = cfg.n_heads // tp_size
    hkv = cfg.n_kv_heads // tp_size
    h2 = h.reshape(B * S, d)

    q = matmul_t(h2, lp["wq"])   # (B*S, hq*Dh) local heads
    k = matmul_t(h2, lp["wk"])
    v = matmul_t(h2, lp["wv"])

    def to_heads(x, nh):
        return (x.reshape(B, S, nh, Dh).transpose(0, 2, 1, 3))

    q = to_heads(q, hq)
    k = to_heads(k, hkv)
    v = to_heads(v, hkv)

    # RoPE on q/k: one batched kernel call over flattened rows
    q = rope_t(q.reshape(B * hq * S, Dh), S).reshape(B, hq, S, Dh)
    k = rope_t(k.reshape(B * hkv * S, Dh), S).reshape(B, hkv, S, Dh)

    if cfg.sinks is not None:
        # sinks are an inference-only mask: run the plain forward kernel
        # (differentiating through it raises — by design)
        o = flash_attention(q, k, v, causal=True, window=cfg.window,
                            sinks=cfg.sinks, softcap=cfg.softcap)
    else:
        o = flash_attention_trainable(q, k, v, True, None,
                                      cfg.window, cfg.softcap)
    o = o.transpose(0, 2, 1, 3).reshape(B * S, hq * Dh)
    o = matmul_t(o, lp["wo"])
    if tp_axis is not None:
        o = _psum_invariant(o, tp_axis)
    o = o.reshape(B, S, d)
    if sp_axis is not None:
        rank = lax.axis_index(sp_axis)
        s_loc = S // lax.axis_size(sp_axis)
        o = lax.dynamic_slice_in_dim(o, rank * s_loc, s_loc, axis=1)
    return o


def _mlp_block(h, lp, tp_axis):
    B, S, d = h.shape
    if tp_axis is not None:
        h = _enter_varying(h, tp_axis)
    h2 = h.reshape(B * S, d)
    u = matmul_t(h2, lp["w1"])
    u = jax.nn.gelu(u)
    y = matmul_t(u, lp["w2"])
    if tp_axis is not None:
        y = _psum_invariant(y, tp_axis)
    return y.reshape(B, S, d)


def _moe_block(h, lp, cfg: Config, ep_axis):
    """Routed MoE FFN (models/moe.py): each shard routes its local tokens;
    experts are ep-sharded and tokens move via all_to_all."""
    from tpukern.models.moe import moe_block_topk
    B, S, d = h.shape
    y = moe_block_topk(h.reshape(B * S, d), lp["moe"], k=cfg.moe_top_k,
                       capacity_factor=cfg.moe_capacity_factor,
                       ep_axis=ep_axis)
    return y.reshape(B, S, d)


def forward(params, tokens, cfg: Config, tp_size: int = 1, tp_axis=None,
            sp_axis=None, ep_axis=None, return_hidden=False):
    """tokens (B, S_local) int32 -> logits (B, S_local, vocab) f32.
    With sp_axis, S_local is the per-shard slice of the sequence. With
    return_hidden, stop before the LM head and return the final-norm
    hidden states (B*S_local, d) instead (the fused-loss entry point)."""
    B, S = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0)

    def layer(h, lp):
        hn = rms_norm_t(h.reshape(B * S, -1), lp["ln1"]).reshape(h.shape)
        h = h + _attn_block(hn, lp, cfg, tp_size, tp_axis, sp_axis)
        hn = rms_norm_t(h.reshape(B * S, -1), lp["ln2"]).reshape(h.shape)
        if cfg.n_experts:
            h = h + _moe_block(hn, lp, cfg, ep_axis)
        else:
            h = h + _mlp_block(hn, lp, tp_axis)
        return h

    if cfg.remat:
        # activation rematerialization: keep only the per-layer boundary
        # activations live through the backward pass; everything inside a
        # layer (attention, MLP, norms) is recomputed — the standard
        # FLOPs-for-HBM trade for deep stacks / long sequences
        layer = jax.checkpoint(layer)
    for lp in params["layers"]:
        h = layer(h, lp)
    hn = rms_norm_t(h.reshape(B * S, -1), params["lnf"])
    if return_hidden:
        return hn
    logits = matmul_t(hn, params["head"]).reshape(B, S, cfg.vocab)
    return logits.astype(jnp.float32)


def loss_fn(params, tokens, targets, cfg: Config, tp_size=1, tp_axis=None,
            sp_axis=None, ep_axis=None):
    if cfg.fused_loss:
        # head is replicated on every mesh we build (param_specs), so each
        # shard runs the fused kernel on its local tokens; the caller's
        # pmean over mesh axes turns the local means into the global mean
        from tpukern.ops.cross_entropy import fused_cross_entropy
        hn = forward(params, tokens, cfg, tp_size, tp_axis, sp_axis,
                     ep_axis, return_hidden=True)
        losses = fused_cross_entropy(hn, params["head"],
                                     targets.reshape(-1))
        return jnp.mean(losses)
    logits = forward(params, tokens, cfg, tp_size, tp_axis, sp_axis, ep_axis)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def _accum_grads(grad_of_batch, tokens, targets, accum_steps):
    """Split the batch into accum_steps microbatches, lax.scan the grad
    fn over them, and average — the grad of the full-batch mean loss
    exactly (equal microbatch sizes), at 1/accum_steps the activation
    memory."""
    B = tokens.shape[0]
    assert B % accum_steps == 0, (B, accum_steps)
    mb = B // accum_steps
    tok_mb = tokens.reshape(accum_steps, mb, *tokens.shape[1:])
    tgt_mb = targets.reshape(accum_steps, mb, *targets.shape[1:])

    def body(carry, batch):
        loss_acc, grads_acc = carry
        loss, grads = grad_of_batch(*batch)
        return (loss_acc + loss,
                jax.tree.map(jnp.add, grads_acc, grads)), None

    loss0, grads0 = grad_of_batch(tok_mb[0], tgt_mb[0])
    (loss, grads), _ = jax.lax.scan(
        body, (loss0, grads0), (tok_mb[1:], tgt_mb[1:]))
    inv = 1.0 / accum_steps
    return loss * inv, jax.tree.map(lambda g: g * inv, grads)


def make_train_step(cfg: Config, tx, accum_steps=1):
    """Single-device train step (params, opt_state, tokens, targets).
    accum_steps > 1 splits the batch into that many microbatches and
    accumulates gradients before the single optimizer update."""

    def step(params, opt_state, tokens, targets):
        def gb(tok, tgt):
            return jax.value_and_grad(loss_fn)(params, tok, tgt, cfg)

        if accum_steps > 1:
            loss, grads = _accum_grads(gb, tokens, targets, accum_steps)
        else:
            loss, grads = gb(tokens, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_grad_fn(cfg: Config, mesh: Mesh):
    """shard_mapped (params, tokens, targets) -> (loss, grads) over a
    ("dp", "tp"[, "sp"]) mesh. Gradients equal the single-device gradients
    of loss_fn on the full (unsharded) batch."""
    tp_size = mesh.shape["tp"]
    has_sp = "sp" in mesh.axis_names
    has_ep = "ep" in mesh.axis_names
    sp_axis = "sp" if has_sp else None
    ep_axis = "ep" if has_ep else None
    all_axes = ("dp", "tp") + (("sp",) if has_sp else ()) \
        + (("ep",) if has_ep else ())
    p_specs = param_specs(cfg, ep=has_ep)
    flat_specs = jax.tree.leaves(p_specs, is_leaf=lambda x: isinstance(x, P))

    def _spec_axes(s):
        return {a for part in s if part is not None
                for a in ((part,) if isinstance(part, str) else part)}

    def local_grads(params, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, tokens, targets, cfg, tp_size, "tp", sp_axis, ep_axis)
        flat_g, treedef = jax.tree.flatten(grads)
        fixed = []
        for g, s in zip(flat_g, flat_specs):
            axes = _spec_axes(s)
            g = lax.pmean(g, tuple(a for a in all_axes if a not in axes))
            if has_ep and "ep" in axes:
                # ep-sharded (expert) params: the all_to_all transpose
                # already SUMS every ep member's token contributions into
                # the local expert grad, but the global loss is the MEAN
                # over data shards — divide by ep (verified exact vs
                # single-device grads in tests/test_model.py)
                g = g / mesh.shape["ep"]
            fixed.append(g)
        grads = jax.tree.unflatten(treedef, fixed)
        loss = lax.pmean(loss, all_axes)
        return loss, grads

    # with an ep axis the batch shards over ("dp","ep") jointly: each ep
    # member routes DISTINCT tokens (ep acts as extra data parallelism
    # outside the MoE block; inside it, experts shard and tokens travel
    # by all_to_all)
    bdim = ("dp", "ep") if has_ep else "dp"
    data_spec = P(bdim, "sp") if has_sp else P(bdim, None)
    return shard_map(
        local_grads, mesh=mesh,
        in_specs=(p_specs, data_spec, data_spec),
        out_specs=(P(), p_specs),
        check_vma=False)


def zero1_specs(cfg: Config, mesh: Mesh, axis="dp", ep=False):
    """ZeRO-1 PartitionSpecs for per-param optimizer state (adam mu/nu):
    shard each otherwise-REPLICATED param's moments over the data axis
    (the first dimension divisible by |axis|); params already sharded on
    a model axis keep their param spec (their moments shard the same way
    the param does, which is already memory-optimal per device).

    Use with make_sharded_train_step(..., zero1=True): the optimizer
    update is elementwise, so annotating the moment shardings is all
    ZeRO-1 needs — XLA partitions the update over dp and re-gathers the
    applied updates into the replicated params (the classic
    reduce-scatter(grad) -> local update -> all-gather(param) schedule
    falls out of GSPMD sharding propagation)."""
    n = mesh.shape[axis]
    p_specs = param_specs(cfg, ep=ep)
    shapes = jax.eval_shape(lambda: init_params(cfg, jax.random.key(0)))

    def leaf(spec, shape):
        if any(s is not None for s in spec):
            return spec  # model-sharded param: moments follow the param
        for d, size in enumerate(shape.shape):
            if size % n == 0 and size >= n:
                return P(*([None] * d), axis)
        return spec

    return jax.tree.map(leaf, p_specs, shapes,
                        is_leaf=lambda x: isinstance(x, P))


def shard_opt_state(opt_state, params, zspecs, p_specs, mesh: Mesh):
    """device_put an optax opt state with ZeRO-1 shardings: leaves with a
    param's shape take that param's zero1 spec; scalars/rest replicate."""
    by_shape = {}
    flat_p = jax.tree.leaves(params)
    flat_z = jax.tree.leaves(zspecs, is_leaf=lambda x: isinstance(x, P))
    for p, z in zip(flat_p, flat_z):
        by_shape.setdefault(p.shape, z)

    def put(leaf):
        spec = by_shape.get(getattr(leaf, "shape", None), P())
        if not isinstance(leaf, jnp.ndarray):
            return leaf
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, opt_state)


def make_sharded_train_step(cfg: Config, tx, mesh: Mesh, zero1=False,
                            accum_steps=1):
    """SPMD train step over a ("dp", "tp") or ("dp", "tp", "sp") mesh.

    The forward/backward runs under shard_map (explicit SPMD: Pallas
    kernels see local shards; tp row-split outputs psum over "tp"; with an
    "sp" axis the sequence dim of the data is sharded too). The tp-branch
    boundary markers (_enter_varying / _psum_invariant) give exact
    per-device gradients despite check_vma=False. Gradient sync is then
    purely data-parallel averaging: every param pmeans over the mesh axes
    it is not sharded on (for replicated params the tp leg of that pmean
    averages identical values — a no-op). The optax update stays outside
    shard_map — it is elementwise, so GSPMD keeps params/opt-state
    shardings as-is.

    zero1=True additionally pins per-param optimizer-state moments to
    dp-sharded layouts inside the step (ZeRO-1: each dp member stores and
    updates 1/dp of the moments; pass the opt state through
    shard_opt_state(...) first so the initial layout matches).

    accum_steps > 1 scans the (still dp-sharded) microbatches through the
    shard_mapped grad fn and averages before the single optimizer update
    (gradient accumulation; the global batch must split evenly)."""
    grad_fn = make_sharded_grad_fn(cfg, mesh)
    zspecs = (zero1_specs(cfg, mesh, ep="ep" in mesh.axis_names)
              if zero1 else None)

    def _pin(opt_state, params):
        by_shape = {}
        for p, z in zip(jax.tree.leaves(params),
                        jax.tree.leaves(zspecs,
                                        is_leaf=lambda x: isinstance(x, P))):
            by_shape.setdefault(p.shape, z)
        return jax.tree.map(
            lambda leaf: jax.lax.with_sharding_constraint(
                leaf, NamedSharding(
                    mesh, by_shape.get(getattr(leaf, "shape", None), P())))
            if isinstance(leaf, jnp.ndarray) else leaf,
            opt_state)

    @jax.jit
    def step(params, opt_state, tokens, targets):
        if accum_steps > 1:
            loss, grads = _accum_grads(
                lambda tok, tgt: grad_fn(params, tok, tgt),
                tokens, targets, accum_steps)
        else:
            loss, grads = grad_fn(params, tokens, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        if zero1:
            opt_state = _pin(opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
