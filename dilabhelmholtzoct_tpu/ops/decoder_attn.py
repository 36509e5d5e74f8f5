"""Fused image→token cross-attention + residual + LayerNorm (Pallas, TPU).

Reference behavior: the image-side update of SAM's TwoWayAttentionBlock —
``keys = LN(keys + Attn(q=keys+pe, k=tokens, v=tokens))`` — executed by
the HF mask decoder the reference fine-tunes (invoked via ``model(...)``
at octsam/models/training_utils.py:55-58).

Why a kernel: with only ~7 prompt tokens on the k/v side, every stage of
the chain is a PER-ROW map over the (B·prompts)·4096 image rows — q
projection, nh-head scores against ≤T_PAD tokens, softmax, value mix,
output projection, residual add, LayerNorm. The XLA path materializes
each stage on (64, 4096, ·) HBM tensors (~6 ms of LN/projection/attention
ops per cached step, xplane round 3); here the whole chain runs per VMEM
row block. The backward is a hybrid: the kernel recomputes the row chain,
accumulates the constant-index weight/LN gradients in VMEM, and emits the
per-row intermediates (d_qpre, p, d_score, d_out) that the cross-row
token/positional gradients need — those become plain XLA einsums outside,
avoiding every non-consecutive accumulator-revisit pattern in the grid.

Multi-head structure: tokens' k/v are rearranged once per program into
block-diagonal (lanes, nh·T_PAD) / (nh·T_PAD, lanes) forms so the
multi-head score and mix are single MXU dots. Softmax runs in f32 with a
GLOBAL row max as the shift — exact for every per-head segment (softmax
is shift-invariant), with the denominator clamped against underflow when
one head's scores sit ~88 nats below another's (cannot occur at these
activations' magnitudes; the clamp only guards NaNs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

T_PAD = 8  # token capacity per head block; the training paths use 7


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _consts(internal: int, nh: int, n_tok: int):
    """Block-diag lane masks (both orientations — Mosaic cannot lower an
    in-kernel transpose, so every constant is built directly with iotas),
    the -inf pad row (1, cols), and the per-head column selector in both
    orientations."""
    hd = internal // nh
    cols = nh * T_PAD

    def diag(rows, cols_, rdiv, cdiv):
        a = jax.lax.broadcasted_iota(jnp.int32, (rows, cols_), 0) // rdiv
        b = jax.lax.broadcasted_iota(jnp.int32, (rows, cols_), 1) // cdiv
        return a == b

    kmask = diag(internal, cols, hd, T_PAD)  # lane-head == col-head
    vmask = diag(cols, internal, T_PAD, hd)  # transposed orientation
    col_t = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1) % T_PAD
    pad = jnp.where(col_t < n_tok, 0.0, -jnp.inf).astype(jnp.float32)
    sel = diag(cols, nh, T_PAD, 1).astype(jnp.float32)
    sel_t = diag(nh, cols, 1, T_PAD).astype(jnp.float32)
    return kmask, vmask, pad, sel, sel_t


def _token_mats(ktT, vb, kmask, vmask, dtype):
    """tok kT (internal, T_PAD) / v (T_PAD, internal) → K' (internal,
    cols), V' (cols, internal).

    K'[(h,d), (h',t)] = k[t, h·hd+d]·δ_hh'; V' likewise transposed. Built
    once per program from tiny pre-transposed/padded tiles (Mosaic cannot
    lower an in-kernel tpu.transpose, so the caller ships k transposed
    and both mask orientations come from _consts).
    """
    nh = kmask.shape[1] // T_PAD
    kt_t = jnp.concatenate([ktT] * nh, axis=1)  # (internal, cols)
    kd = jnp.where(kmask, kt_t, jnp.zeros_like(kt_t)).astype(dtype)
    v_t = jnp.concatenate([vb] * nh, axis=0)  # (cols, internal)
    vd = jnp.where(vmask, v_t, jnp.zeros_like(v_t))
    return kd, vd.astype(dtype)


def _chain(keys_blk, pe_blk, kd, vd, pad, sel, sel_t, wq_ref, bq_ref,
           wo_ref, bo_ref, g_ref, bt_ref, *, nh: int, eps: float):
    """Forward row chain; returns every stage the backward needs."""
    dtype = keys_blk.dtype
    internal = wq_ref.shape[1]
    hd = internal // nh

    qin = keys_blk + pe_blk  # bf16, matches keys + key_pe
    qpre = _dot(qin, wq_ref[...]) + bq_ref[0]  # f32 accum + f32 bias
    qb = qpre.astype(dtype)  # linear() casts to activation dtype
    scale = jnp.asarray(hd ** -0.5, dtype)
    s = _dot(qb * scale, kd) + pad  # same dtype math as the XLA q*scale

    rowmax = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - rowmax)
    denom = jnp.maximum(_dot(_dot(e, sel), sel_t), 1e-30)
    p = e / denom  # f32, == jax.nn.softmax per head segment
    pb = p.astype(dtype)

    out = _dot(pb, vd)  # (BM, internal) f32
    outb = out.astype(dtype)
    proj = _dot(outb, wo_ref[...]) + bo_ref[0]  # f32
    res = keys_blk + proj.astype(dtype)  # bf16 residual, matches XLA path

    x32 = res.astype(jnp.float32)
    mu = jnp.mean(x32, axis=1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    yn = xc * r
    y = (yn * g_ref[0] + bt_ref[0]).astype(dtype)
    return qin, qpre, qb, s, p, pb, out, outb, res, xc, r, yn, y


def _fwd_kernel(keys_ref, pe_ref, kb_ref, vb_ref, wq_ref, bq_ref, wo_ref,
                bo_ref, g_ref, bt_ref, out_ref, *, nh: int, n_tok: int,
                eps: float):
    internal = wq_ref.shape[1]
    kmask, vmask, pad, sel, sel_t = _consts(internal, nh, n_tok)
    kd, vd = _token_mats(kb_ref[0], vb_ref[0], kmask, vmask,
                         keys_ref.dtype)
    *_, y = _chain(keys_ref[0], pe_ref[0], kd, vd, pad, sel, sel_t,
                   wq_ref, bq_ref, wo_ref, bo_ref, g_ref, bt_ref, nh=nh,
                   eps=eps)
    out_ref[0] = y


def _bwd_kernel(keys_ref, pe_ref, kb_ref, vb_ref, wq_ref, bq_ref, wo_ref,
                bo_ref, g_ref, bt_ref, dy_ref,
                dkeys_ref, dqpre_ref, p_ref, ds_ref, dout_ref,
                dwq_ref, dbq_ref, dwo_ref, dbo_ref, dg_ref, dbt_ref,
                *, nh: int, n_tok: int, eps: float):
    b_idx = pl.program_id(0)
    m_idx = pl.program_id(1)
    internal = wq_ref.shape[1]
    hd = internal // nh
    dtype = keys_ref.dtype
    kmask, vmask, pad, sel, sel_t = _consts(internal, nh, n_tok)
    kd, vd = _token_mats(kb_ref[0], vb_ref[0], kmask, vmask, dtype)

    (qin, qpre, qb, s, p, pb, out, outb, res, xc, r, yn, y) = _chain(
        keys_ref[0], pe_ref[0], kd, vd, pad, sel, sel_t, wq_ref, bq_ref,
        wo_ref, bo_ref, g_ref, bt_ref, nh=nh, eps=eps)

    dy = dy_ref[0].astype(jnp.float32)
    # LayerNorm backward (full-row groups)
    dg_blk = jnp.sum(dy * yn, axis=0, keepdims=True)
    dbt_blk = jnp.sum(dy, axis=0, keepdims=True)
    dyn = dy * g_ref[0]
    mean_dyn = jnp.mean(dyn, axis=1, keepdims=True)
    mean_dyy = jnp.mean(dyn * yn, axis=1, keepdims=True)
    dres = r * (dyn - mean_dyn - yn * mean_dyy)  # f32
    dres_b = dres.astype(dtype)

    # residual: keys gets dres directly; proj path continues
    dproj = dres  # f32 (cast chain matches the XLA bf16 residual add)
    dproj_b = dproj.astype(dtype)
    dwo_blk = jax.lax.dot_general(
        outb, dproj_b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbo_blk = jnp.sum(dproj, axis=0, keepdims=True)
    dout = jax.lax.dot_general(
        dproj_b, wo_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BM, internal)
    dout_b = dout.astype(dtype)

    dp = jax.lax.dot_general(
        dout_b, vd, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BM, cols)
    # softmax backward per head segment
    pdp = p * dp
    seg = _dot(_dot(pdp, sel), sel_t)
    ds = pdp - p * seg  # f32 (pad cols: p == 0 → ds == 0)
    ds_b = ds.astype(dtype)

    scale = jnp.asarray(hd ** -0.5, jnp.float32)
    dqb = jax.lax.dot_general(
        ds_b, kd, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BM, internal)
    dqpre = dqb  # cast-through
    dqpre_b = dqpre.astype(dtype)
    dwq_blk = jax.lax.dot_general(
        qin, dqpre_b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq_blk = jnp.sum(dqpre, axis=0, keepdims=True)

    dkeys_ref[0] = (dres_b.astype(jnp.float32) + jax.lax.dot_general(
        dqpre_b, wq_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)).astype(dkeys_ref.dtype)
    dqpre_ref[0] = dqpre_b
    p_ref[0] = pb
    ds_ref[0] = ds_b
    dout_ref[0] = dout_b

    first = jnp.logical_and(b_idx == 0, m_idx == 0)

    @pl.when(first)
    def _init():
        dwq_ref[...] = dwq_blk
        dbq_ref[...] = dbq_blk
        dwo_ref[...] = dwo_blk
        dbo_ref[...] = dbo_blk
        dg_ref[...] = dg_blk
        dbt_ref[...] = dbt_blk

    @pl.when(jnp.logical_not(first))
    def _acc():
        dwq_ref[...] += dwq_blk
        dbq_ref[...] += dbq_blk
        dwo_ref[...] += dwo_blk
        dbo_ref[...] += dbo_blk
        dg_ref[...] += dg_blk
        dbt_ref[...] += dbt_blk


def _block_m(m: int) -> int:
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m % bm == 0:
            return bm
    return m


def _specs(c, internal, bm, img_div):
    """in_specs shared by fwd/bwd. img_div: keys/pe indexed per-image
    (b // img_div) — 1 for the per-pair layers, pb for the shared layer-1
    form where the residual base is still per-image."""
    def keys_idx(b, mm):
        return (b // img_div, mm, 0)

    return [
        pl.BlockSpec((1, bm, c), keys_idx),
        pl.BlockSpec((1, bm, c), lambda b, mm: (0, mm, 0)),
        pl.BlockSpec((1, internal, T_PAD), lambda b, mm: (b, 0, 0)),
        pl.BlockSpec((1, T_PAD, internal), lambda b, mm: (b, 0, 0)),
        pl.BlockSpec((c, internal), lambda b, mm: (0, 0)),
        pl.BlockSpec((1, internal), lambda b, mm: (0, 0)),
        pl.BlockSpec((internal, c), lambda b, mm: (0, 0)),
        pl.BlockSpec((1, c), lambda b, mm: (0, 0)),
        pl.BlockSpec((1, c), lambda b, mm: (0, 0)),
        pl.BlockSpec((1, c), lambda b, mm: (0, 0)),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused(interpret, eps, nh, img_div, n_tok, keys, pe, tok_k, tok_v,
           wq, bq, wo, bo, g, bt):
    out, _ = _fused_fwd(interpret, eps, nh, img_div, n_tok, keys, pe,
                        tok_k, tok_v, wq, bq, wo, bo, g, bt)
    return out


def _fused_fwd(interpret, eps, nh, img_div, n_tok, keys, pe, tok_k, tok_v,
               wq, bq, wo, bo, g, bt):
    bimg, m, c = keys.shape
    bp = bimg * img_div
    internal = tok_k.shape[1]  # tok_k ships TRANSPOSED: (BP, internal, T_PAD)
    bm = _block_m(m)
    kernel = functools.partial(_fwd_kernel, nh=nh, n_tok=n_tok, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(bp, m // bm),
        in_specs=_specs(c, internal, bm, img_div),
        out_specs=pl.BlockSpec((1, bm, c), lambda b, mm: (b, mm, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, m, c), keys.dtype),
        interpret=interpret,
    )(keys, pe, tok_k, tok_v, wq, bq, wo, bo, g, bt)
    return out, (keys, pe, tok_k, tok_v, wq, bq, wo, bo, g, bt)


def _fused_bwd(interpret, eps, nh, img_div, n_tok, res, dy):
    keys, pe, tok_k, tok_v, wq, bq, wo, bo, g, bt = res
    bimg, m, c = keys.shape
    bp = bimg * img_div
    internal = tok_k.shape[1]
    cols = nh * T_PAD
    hd = internal // nh
    bm = _block_m(m)
    f32 = jnp.float32
    kernel = functools.partial(_bwd_kernel, nh=nh, n_tok=n_tok, eps=eps)
    blocked = lambda last: pl.BlockSpec((1, bm, last),
                                        lambda b, mm: (b, mm, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(bp, m // bm),
        in_specs=_specs(c, internal, bm, img_div)
        + [blocked(c)],
        out_specs=[
            blocked(c), blocked(internal), blocked(cols), blocked(cols),
            blocked(internal),
            pl.BlockSpec((c, internal), lambda b, mm: (0, 0)),
            pl.BlockSpec((1, internal), lambda b, mm: (0, 0)),
            pl.BlockSpec((internal, c), lambda b, mm: (0, 0)),
            pl.BlockSpec((1, c), lambda b, mm: (0, 0)),
            pl.BlockSpec((1, c), lambda b, mm: (0, 0)),
            pl.BlockSpec((1, c), lambda b, mm: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, m, c), keys.dtype),
            jax.ShapeDtypeStruct((bp, m, internal), keys.dtype),
            jax.ShapeDtypeStruct((bp, m, cols), keys.dtype),
            jax.ShapeDtypeStruct((bp, m, cols), keys.dtype),
            jax.ShapeDtypeStruct((bp, m, internal), keys.dtype),
            jax.ShapeDtypeStruct((c, internal), f32),
            jax.ShapeDtypeStruct((1, internal), f32),
            jax.ShapeDtypeStruct((internal, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        interpret=interpret,
    )(keys, pe, tok_k, tok_v, wq, bq, wo, bo, g, bt, dy)
    (dkeys_pair, dqpre, p_rows, ds_rows, dout_rows,
     dwq, dbq, dwo, dbo, dg, dbt) = outs

    # cross-row reductions as plain XLA einsums over the emitted rows;
    # qb is recomputed with one big MXU dot (cheap)
    qb = (jnp.einsum(
        "bmc,ci->bmi", (keys + pe).astype(keys.dtype), wq,
        preferred_element_type=jnp.float32) + bq[0]).astype(keys.dtype)
    if img_div > 1:
        qb = jnp.repeat(qb, img_div, axis=0)
    qs = qb * jnp.asarray(hd ** -0.5, keys.dtype)

    ds4 = ds_rows.reshape(bp, m, nh, T_PAD)
    p4 = p_rows.reshape(bp, m, nh, T_PAD)
    q4 = qs.reshape(bp, m, nh, hd)
    do4 = dout_rows.reshape(bp, m, nh, hd)
    # cotangents in the SHIPPED (padded/transposed) token layouts; pad
    # token columns have ds == p == 0, so their gradients are zero
    d_tok_k = jnp.einsum("bmht,bmhd->bthd", ds4, q4,
                         preferred_element_type=jnp.float32)
    d_tok_k = jnp.swapaxes(d_tok_k.reshape(bp, T_PAD, internal), 1, 2)
    d_tok_v = jnp.einsum("bmht,bmhd->bthd", p4, do4,
                         preferred_element_type=jnp.float32)
    d_tok_v = d_tok_v.reshape(bp, T_PAD, internal)

    d_pe = jnp.einsum("bmi,ci->mc", dqpre.astype(jnp.float32), wq,
                      preferred_element_type=jnp.float32)[None]
    if img_div > 1:
        dkeys = dkeys_pair.reshape(bimg, img_div, m, c).sum(1)
    else:
        dkeys = dkeys_pair

    cast = lambda t, ref: t.astype(ref.dtype)
    return (cast(dkeys, keys), cast(d_pe, pe), cast(d_tok_k, tok_k),
            cast(d_tok_v, tok_v), cast(dwq, wq), cast(dbq, bq),
            cast(dwo, wo), cast(dbo, bo), cast(dg, g), cast(dbt, bt))


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Data-parallel variant: like ops/upscaler.py's, the Mosaic custom calls are
# opaque to GSPMD (it replicates them), so under a DP mesh the fwd/bwd run
# per-shard via shard_map; replicated inputs' gradients (weights, LN params,
# the positional grid) take explicit psums.
# ---------------------------------------------------------------------------


def _dp_specs():
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    d = P(DATA_AXIS)
    # keys, pe, tok_kT, tok_v, wq, bq, wo, bo, g, bt
    return (d, P(), d, d, P(), P(), P(), P(), P(), P())


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_dp(mesh, interpret, eps, nh, img_div, n_tok, keys, pe, tok_k,
              tok_v, wq, bq, wo, bo, g, bt):
    out, _ = _fused_dp_fwd(mesh, interpret, eps, nh, img_div, n_tok, keys,
                           pe, tok_k, tok_v, wq, bq, wo, bo, g, bt)
    return out


def _fused_dp_fwd(mesh, interpret, eps, nh, img_div, n_tok, keys, pe,
                  tok_k, tok_v, wq, bq, wo, bo, g, bt):
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, shard_map_kernel

    def inner(*args):
        return _fused_fwd(interpret, eps, nh, img_div, n_tok, *args)[0]

    out = shard_map_kernel(inner, mesh, in_specs=_dp_specs(),
                           out_specs=P(DATA_AXIS))(
        keys, pe, tok_k, tok_v, wq, bq, wo, bo, g, bt)
    return out, (keys, pe, tok_k, tok_v, wq, bq, wo, bo, g, bt)


def _fused_dp_bwd(mesh, interpret, eps, nh, img_div, n_tok, res, dy):
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, shard_map_kernel

    def inner(dy, *args):
        grads = _fused_bwd(interpret, eps, nh, img_div, n_tok, args, dy)
        dkeys, dpe, dtk, dtv, dwq, dbq, dwo, dbo, dg, dbt = grads
        ps = lambda t: jax.lax.psum(t, DATA_AXIS)
        return (dkeys, ps(dpe), dtk, dtv, ps(dwq), ps(dbq), ps(dwo),
                ps(dbo), ps(dg), ps(dbt))

    d = P(DATA_AXIS)
    return shard_map_kernel(
        inner, mesh,
        in_specs=(d,) + _dp_specs(),
        out_specs=(d, P(), d, d, P(), P(), P(), P(), P(), P()),
    )(dy, *res)


_fused_dp.defvjp(_fused_dp_fwd, _fused_dp_bwd)


def fused_i2t_ln(keys, pe, tok_k, tok_v, q_p, out_p, ln_p, *, nh: int,
                 pb: int = 1, eps: float = 1e-6, interpret: bool = False):
    """keys = LN(keys + MHA(q=keys+pe, k=tok_k, v=tok_v)) fused per row.

    keys: (B_img, M, C) — per-IMAGE when pb > 1 (the shared layer-1 form;
    the per-pair tensor first materializes as this op's residual) or
    per-pair with pb == 1. pe: (1, M, C). tok_k/tok_v: (B_pair, T,
    internal) — the token-side projections, computed outside (tiny).
    Returns (B_pair, M, C).
    """
    n_tok = tok_k.shape[1]
    assert n_tok <= T_PAD, (n_tok, T_PAD)
    padt = ((0, 0), (0, T_PAD - n_tok), (0, 0))
    # ship k transposed and both padded to T_PAD (Mosaic cannot lower an
    # in-kernel transpose; these are tiny XLA ops, differentiable)
    tok_kt = jnp.swapaxes(jnp.pad(tok_k, padt), 1, 2)
    tok_vp = jnp.pad(tok_v, padt)
    from ..parallel.mesh import kernel_mesh

    mesh = kernel_mesh(keys.shape[0])
    fn = (functools.partial(_fused_dp, mesh) if mesh is not None
          else _fused)
    return fn(
        interpret, eps, nh, pb, n_tok, keys, pe,
        tok_kt, tok_vp,
        q_p["w"].astype(keys.dtype), q_p["b"].astype(jnp.float32)[None],
        out_p["w"].astype(keys.dtype), out_p["b"].astype(jnp.float32)[None],
        ln_p["scale"].astype(jnp.float32)[None],
        ln_p["bias"].astype(jnp.float32)[None],
    )
