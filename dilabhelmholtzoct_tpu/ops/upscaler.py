"""Fused mask-decoder upscaler + hypernetwork contraction (Pallas, TPU).

Reference behavior: SAM's ``output_upscaling`` Sequential (convT 2x2/s2 →
LayerNorm2d → GELU → convT 2x2/s2 → GELU) followed by the per-mask-token
hypernetwork dot over the 32 upscaled channels
(``mask_decoder`` in the HF SAM the reference fine-tunes; the reference
invokes it via ``model(...)`` at octsam/models/training_utils.py:55-58).

Why a kernel: at the training geometry (64 (image,prompt) pairs, 64x64
grid) the XLA path materializes the second upscale — a (64, 64, 64,
2,2,2,2, 32) bf16 tensor, 268 MB — writes it, re-reads it for the
hypernetwork einsum, and re-derives it twice more in the backward
(gelu-grad and the ct2 weight-gradient megafusion measured at 1.44 ms,
xplane round 3). Both transposed convs are 1x1-block matmuls over the
feature dim (stride == kernel, no overlap), so the whole chain

    up (BM, C) → dot W1 → LayerNorm → GELU → dot W2 → GELU → ⟨·, hyper⟩

fits in VMEM per row-block and the 268 MB tensor never exists in HBM.
The backward kernel recomputes the chain blockwise (flash-style) and
accumulates weight gradients in VMEM across the sequential TPU grid.

Layouts (all free reshapes of the natural parameters):
  lane axis 1: l1 = (d, e, c1)  = d·2·C1 + e·C1 + c1      (4·C1 lanes)
  lane axis 2: l2 = (d, e, f, g, c2) = pix·C2 + c2        (16·C2 lanes)
where (d, e) indexes the first 2x2 upscale, (f, g) the second, C1 = C/4,
C2 = C/8. The LayerNorm2d groups are the C1-lane segments of axis 1; the
segment mean/var/broadcasts are expressed as tiny matmuls with 0/1
selector matrices (Mosaic requires expansions to be matmuls).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - platform probing
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_KAPPA = 0.044715


def _gelu_fwd(x32, approximate: bool):
    """f32 GELU matching models.sam.gelu (tanh for bf16, erf for f32)."""
    if approximate:
        inner = _SQRT_2_OVER_PI * (x32 + _KAPPA * x32 * x32 * x32)
        return 0.5 * x32 * (1.0 + jnp.tanh(inner))
    return 0.5 * x32 * (1.0 + jax.lax.erf(x32 * (2.0 ** -0.5)))


def _gelu_grad(x32, approximate: bool):
    if approximate:
        x2 = x32 * x32
        inner = _SQRT_2_OVER_PI * (x32 + _KAPPA * x32 * x2)
        t = jnp.tanh(inner)
        di = _SQRT_2_OVER_PI * (1.0 + 3.0 * _KAPPA * x2)
        return 0.5 * (1.0 + t) + 0.5 * x32 * (1.0 - t * t) * di
    phi = jnp.exp(-0.5 * x32 * x32) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + jax.lax.erf(x32 * (2.0 ** -0.5)))
    return cdf + x32 * phi


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chain_fwd(up_blk, w1_ref, b1_ref, g_ref, bt_ref, w2_ref, b2_ref,
               *, c1: int, eps: float, approx: bool):
    """Shared forward math: up block → u2 gelu output (+ LN residuals)."""
    l1 = w1_ref.shape[1]
    dtype = up_blk.dtype

    u1pre = _dot(up_blk, w1_ref[...]) + b1_ref[0]  # (BM, L1) f32

    # LayerNorm over C1-lane segments via selector matmuls
    p_sel = _seg_sel(l1, c1)  # (L1, nseg)
    inv = 1.0 / c1
    mu = _dot(_dot(u1pre, p_sel) * inv, p_sel.T)
    xc = u1pre - mu
    var = _dot(_dot(xc * xc, p_sel) * inv, p_sel.T)
    r = jax.lax.rsqrt(var + eps)
    y = xc * r
    out1 = y * g_ref[0] + bt_ref[0]

    u1g = _gelu_fwd(out1.astype(dtype).astype(jnp.float32), approx)
    u1g = u1g.astype(dtype)
    u2pre = _dot(u1g, w2_ref[...]) + b2_ref[0]  # (BM, L2) f32
    u2g = _gelu_fwd(u2pre.astype(dtype).astype(jnp.float32), approx)
    return u1pre, xc, r, y, out1, u1g, u2pre, u2g.astype(dtype)


def _pix_sel(l2: int, c2: int, dtype):
    """(L2, 16) selector: lane (pix, c2) → column pix."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (l2, 16), 0) // c2
    col = jax.lax.broadcasted_iota(jnp.int32, (l2, 16), 1)
    return (pix == col).astype(dtype)


def _seg_sel(l1: int, c1: int):
    """(L1, L1/c1) 0/1 selector mapping lane → its LayerNorm segment.
    Shared by forward and backward so the segment layout can never
    diverge between them."""
    nseg = l1 // c1
    seg = jax.lax.broadcasted_iota(jnp.int32, (l1, nseg), 0) // c1
    col = jax.lax.broadcasted_iota(jnp.int32, (l1, nseg), 1)
    return (seg == col).astype(jnp.float32)


def _fwd_kernel(up_ref, w1_ref, b1_ref, g_ref, bt_ref, w2_ref, b2_ref,
                ht_ref, out_ref, *, c1: int, c2: int, eps: float,
                approx: bool):
    *_, u2g = _chain_fwd(up_ref[0], w1_ref, b1_ref, g_ref, bt_ref,
                         w2_ref, b2_ref, c1=c1, eps=eps, approx=approx)
    l2 = w2_ref.shape[1]
    sel = _pix_sel(l2, c2, jnp.float32)
    u2g32 = u2g.astype(jnp.float32)
    n_out = ht_ref.shape[1]
    # output lanes are (t, pix) flattened: a 3-D (BP, M, n_out*16) out
    # block keeps Mosaic on the regular (8,128) tiling — the 4-D
    # (..., n_out, 16) form got a degenerate T(1,128) layout and XLA
    # inserted a 0.29 ms relayout copy on the cotangent (xplane, round 3)
    cols = []
    for t in range(n_out):
        # f32 product + f32 accumulation — same semantics as the blocked
        # einsum path (preferred_element_type=f32 over bf16 inputs).
        row = ht_ref[0, t:t + 1, :].astype(jnp.float32)  # (1, L2)
        cols.append(_dot(u2g32 * row, sel))
    out_ref[0] = cols[0] if n_out == 1 else jnp.concatenate(cols, axis=1)


def _bwd_kernel(up_ref, dm_ref, w1_ref, b1_ref, g_ref, bt_ref, w2_ref,
                b2_ref, ht_ref,
                dup_ref, dw1_ref, db1_ref, dg_ref, dbt_ref, dw2_ref,
                db2_ref, dht_ref, *, c1: int, c2: int, eps: float,
                approx: bool):
    b_idx = pl.program_id(0)
    m_idx = pl.program_id(1)

    up_blk = up_ref[0]
    (u1pre, xc, r, y, out1, u1g, u2pre, u2g) = _chain_fwd(
        up_blk, w1_ref, b1_ref, g_ref, bt_ref, w2_ref, b2_ref,
        c1=c1, eps=eps, approx=approx)

    l1 = w1_ref.shape[1]
    l2 = w2_ref.shape[1]
    dtype = up_blk.dtype
    sel = _pix_sel(l2, c2, jnp.float32)
    u2g32 = u2g.astype(jnp.float32)

    n_out = ht_ref.shape[1]
    d_u2g = jnp.zeros(u2g.shape, jnp.float32)
    dht_rows = []
    dm_blk = dm_ref[0]  # (BM, n_out*16)
    for t in range(n_out):
        # grad wrt u2g and wrt the tiled hyper vector, per mask token
        g_t = jax.lax.dot_general(
            dm_blk if n_out == 1 else dm_blk[:, t * 16:(t + 1) * 16], sel,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BM, L2): dm broadcast over the c2 lanes of each pixel
        row = ht_ref[0, t:t + 1, :].astype(jnp.float32)  # (1, L2)
        d_u2g = d_u2g + g_t * row
        dht_rows.append(jnp.sum(g_t * u2g32, axis=0, keepdims=True))
    dht_blk = jnp.concatenate(dht_rows, axis=0)[None]  # (1, n_out, L2)

    d_u2pre = d_u2g * _gelu_grad(
        u2pre.astype(dtype).astype(jnp.float32), approx)
    d_u2pre_l = d_u2pre.astype(dtype)

    d_u1g = jax.lax.dot_general(
        d_u2pre_l, w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BM, L1)

    d_out1 = d_u1g * _gelu_grad(
        out1.astype(dtype).astype(jnp.float32), approx)
    dg_blk = jnp.sum(d_out1 * y, axis=0, keepdims=True)
    dbt_blk = jnp.sum(d_out1, axis=0, keepdims=True)
    d_y = d_out1 * g_ref[0]

    p_sel = _seg_sel(l1, c1)
    inv = 1.0 / c1
    mean_dy = _dot(_dot(d_y, p_sel) * inv, p_sel.T)
    yn = xc * r  # == y before affine
    mean_dyy = _dot(_dot(d_y * yn, p_sel) * inv, p_sel.T)
    d_u1pre = r * (d_y - mean_dy - yn * mean_dyy)
    d_u1pre_l = d_u1pre.astype(dtype)

    dup_ref[0] = jax.lax.dot_general(
        d_u1pre_l, w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dup_ref.dtype)

    dw1_blk = jax.lax.dot_general(
        up_blk, d_u1pre_l, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_blk = jnp.sum(d_u1pre, axis=0, keepdims=True)
    dw2_blk = jax.lax.dot_general(
        u1g, d_u2pre_l, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_blk = jnp.sum(d_u2pre, axis=0, keepdims=True)

    first = jnp.logical_and(b_idx == 0, m_idx == 0)

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1_blk
        db1_ref[...] = db1_blk
        dg_ref[...] = dg_blk
        dbt_ref[...] = dbt_blk
        dw2_ref[...] = dw2_blk
        db2_ref[...] = db2_blk

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] += dw1_blk
        db1_ref[...] += db1_blk
        dg_ref[...] += dg_blk
        dbt_ref[...] += dbt_blk
        dw2_ref[...] += dw2_blk
        db2_ref[...] += db2_blk

    @pl.when(m_idx == 0)
    def _init_ht():
        dht_ref[...] = dht_blk

    @pl.when(m_idx != 0)
    def _acc_ht():
        dht_ref[...] += dht_blk


def _block_m(m: int) -> int:
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m % bm == 0:
            return bm
    return m


def _operands(w1, b1, ln_scale, ln_bias, w2, b2, hyper):
    """Reshape the natural conv/LN/hyper params into kernel lane layouts.

    All reshapes/tiles here are tiny (parameter-sized); XLA folds them
    into the step's constant prologue.
    """
    c, _, _, c1 = w1.shape
    c2 = w2.shape[-1]
    w1f = w1.reshape(c, 4 * c1)
    b1f = jnp.tile(b1.astype(jnp.float32), 4)[None]
    gt = jnp.tile(ln_scale.astype(jnp.float32), 4)[None]
    btt = jnp.tile(ln_bias.astype(jnp.float32), 4)[None]
    eye4 = jnp.eye(4, dtype=w2.dtype).reshape(2, 2, 2, 2)
    w2big = jnp.einsum("deDE,cfgo->decDEfgo", eye4, w2).reshape(
        4 * c1, 16 * c2)
    b2f = jnp.tile(b2.astype(jnp.float32), 16)[None]
    ht = jnp.tile(hyper, (1, 1, 16))  # (BP, n_out, 16·C2)
    return w1f, b1f, gt, btt, w2big, b2f, ht, c1, c2


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda b, m: (0,) * len(shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(interpret, eps, up, w1, b1, ln_scale, ln_bias, w2, b2, hyper):
    out, _ = _fused_fwd(interpret, eps, up, w1, b1, ln_scale, ln_bias,
                        w2, b2, hyper)
    return out


def _fused_fwd(interpret, eps, up, w1, b1, ln_scale, ln_bias, w2, b2,
               hyper):
    bp, m, c = up.shape
    n_out = hyper.shape[1]
    (w1f, b1f, gt, btt, w2big, b2f, ht, c1, c2) = _operands(
        w1, b1, ln_scale, ln_bias, w2, b2, hyper)
    bm = _block_m(m)
    grid = (bp, m // bm)
    approx = up.dtype == jnp.bfloat16
    kernel = functools.partial(_fwd_kernel, c1=c1, c2=c2, eps=eps,
                               approx=approx)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, c), lambda b, mm: (b, mm, 0)),
            _full_spec(w1f.shape),
            _full_spec(b1f.shape),
            _full_spec(gt.shape),
            _full_spec(btt.shape),
            _full_spec(w2big.shape),
            _full_spec(b2f.shape),
            pl.BlockSpec((1,) + ht.shape[1:], lambda b, mm: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, n_out * 16),
                               lambda b, mm: (b, mm, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, m, n_out * 16), jnp.float32),
        interpret=interpret,
    )(up, w1f, b1f, gt, btt, w2big, b2f, ht)
    return out, (up, w1, b1, ln_scale, ln_bias, w2, b2, hyper)


def _fused_bwd(interpret, eps, res, dm):
    up, w1, b1, ln_scale, ln_bias, w2, b2, hyper = res
    bp, m, c = up.shape
    n_out = hyper.shape[1]
    (w1f, b1f, gt, btt, w2big, b2f, ht, c1, c2) = _operands(
        w1, b1, ln_scale, ln_bias, w2, b2, hyper)
    l1, l2 = 4 * c1, 16 * c2
    bm = _block_m(m)
    grid = (bp, m // bm)
    approx = up.dtype == jnp.bfloat16
    kernel = functools.partial(_bwd_kernel, c1=c1, c2=c2, eps=eps,
                               approx=approx)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, c), lambda b, mm: (b, mm, 0)),
            pl.BlockSpec((1, bm, n_out * 16), lambda b, mm: (b, mm, 0)),
            _full_spec(w1f.shape),
            _full_spec(b1f.shape),
            _full_spec(gt.shape),
            _full_spec(btt.shape),
            _full_spec(w2big.shape),
            _full_spec(b2f.shape),
            pl.BlockSpec((1,) + ht.shape[1:], lambda b, mm: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, c), lambda b, mm: (b, mm, 0)),
            _full_spec((c, l1)),
            _full_spec((1, l1)),
            _full_spec((1, l1)),
            _full_spec((1, l1)),
            _full_spec((l1, l2)),
            _full_spec((1, l2)),
            pl.BlockSpec((1, n_out, l2), lambda b, mm: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(up.shape, up.dtype),
            jax.ShapeDtypeStruct((c, l1), f32),
            jax.ShapeDtypeStruct((1, l1), f32),
            jax.ShapeDtypeStruct((1, l1), f32),
            jax.ShapeDtypeStruct((1, l1), f32),
            jax.ShapeDtypeStruct((l1, l2), f32),
            jax.ShapeDtypeStruct((1, l2), f32),
            jax.ShapeDtypeStruct((bp, n_out, l2), f32),
        ],
        interpret=interpret,
    )(up, dm, w1f, b1f, gt, btt, w2big, b2f, ht)
    d_up, d_w1f, d_b1f, d_g, d_bt, d_w2big, d_b2f, d_ht = outs

    c1_ = c1
    d_w1 = d_w1f.reshape(c, 2, 2, c1_).astype(w1.dtype)
    d_b1 = d_b1f.reshape(2, 2, c1_).sum((0, 1)).astype(b1.dtype)
    d_scale = d_g.reshape(2, 2, c1_).sum((0, 1)).astype(ln_scale.dtype)
    d_bias = d_bt.reshape(2, 2, c1_).sum((0, 1)).astype(ln_bias.dtype)
    dw2r = d_w2big.reshape(2, 2, c1_, 2, 2, 2, 2, c2)
    d_w2 = jnp.einsum("decdefgo->cfgo", dw2r).astype(w2.dtype)
    d_b2 = d_b2f.reshape(2, 2, 2, 2, c2).sum((0, 1, 2, 3)).astype(b2.dtype)
    d_hyper = d_ht.reshape(bp, n_out, 16, c2).sum(2).astype(hyper.dtype)
    return (d_up, d_w1, d_b1, d_scale, d_bias, d_w2, d_b2, d_hyper)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Data-parallel variant: Mosaic custom calls are opaque to XLA's SPMD
# partitioner (GSPMD replicates them — parallel/mesh.py kernel-mesh note),
# so under a DP mesh the kernels run per-shard via shard_map. Batch-leading
# operands (up, hyper, masks, their grads) shard over 'data'; parameter
# gradients are partial sums over the local shard and take an explicit
# psum — semantically identical to the grad all-reduce GSPMD inserts for
# the rest of the step.
# ---------------------------------------------------------------------------


def _dp_specs(n_batch_lead: int, n_rep: int, n_batch_tail: int = 0):
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    d = P(DATA_AXIS)
    return (d,) * n_batch_lead + (P(),) * n_rep + (d,) * n_batch_tail


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_dp(mesh, interpret, eps, up, w1, b1, ln_scale, ln_bias, w2, b2,
              hyper):
    out, _ = _fused_dp_fwd(mesh, interpret, eps, up, w1, b1, ln_scale,
                           ln_bias, w2, b2, hyper)
    return out


def _fused_dp_fwd(mesh, interpret, eps, up, w1, b1, ln_scale, ln_bias, w2,
                  b2, hyper):
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, shard_map_kernel

    def inner(up, w1, b1, ln_scale, ln_bias, w2, b2, hyper):
        return _fused_fwd(interpret, eps, up, w1, b1, ln_scale, ln_bias,
                          w2, b2, hyper)[0]

    out = shard_map_kernel(
        inner, mesh,
        in_specs=_dp_specs(1, 6, 1),
        out_specs=P(DATA_AXIS),
    )(up, w1, b1, ln_scale, ln_bias, w2, b2, hyper)
    return out, (up, w1, b1, ln_scale, ln_bias, w2, b2, hyper)


def _fused_dp_bwd(mesh, interpret, eps, res, dm):
    from ..parallel.mesh import DATA_AXIS, shard_map_kernel

    def inner(dm, up, w1, b1, ln_scale, ln_bias, w2, b2, hyper):
        grads = _fused_bwd(
            interpret, eps,
            (up, w1, b1, ln_scale, ln_bias, w2, b2, hyper), dm)
        d_up, d_w1, d_b1, d_s, d_b, d_w2, d_b2, d_hyper = grads
        ps = lambda t: jax.lax.psum(t, DATA_AXIS)
        return (d_up, ps(d_w1), ps(d_b1), ps(d_s), ps(d_b), ps(d_w2),
                ps(d_b2), d_hyper)

    return shard_map_kernel(
        inner, mesh,
        in_specs=_dp_specs(2, 6, 1),
        out_specs=_dp_specs(1, 6, 1),
    )(dm, *res)


_fused_dp.defvjp(_fused_dp_fwd, _fused_dp_bwd)


def upscale_hyper_masks(up_flat, upscale_params, hyper_sl, *,
                        eps: float = 1e-6, interpret: bool = False):
    """Fused upscale(2x2 convT → LN2d → GELU → 2x2 convT → GELU) ⊗ hyper.

    up_flat: (BP, G·G, C); hyper_sl: (BP, n_out, C/8)
    Returns (BP, G·G, n_out·16) f32 — per token, lane (t, d, e, f, g); the pixel
    (4h+2d+f, 4w+2e+g) block offset, identical to the blocked einsum
    path's (..., 2, 2, 2, 2) trailing axes.
    """
    p = upscale_params
    args = (
        up_flat,
        p["ct1_w"].astype(up_flat.dtype), p["ct1_b"].astype(jnp.float32),
        p["ln"]["scale"].astype(jnp.float32),
        p["ln"]["bias"].astype(jnp.float32),
        p["ct2_w"].astype(up_flat.dtype), p["ct2_b"].astype(jnp.float32),
        hyper_sl.astype(up_flat.dtype),
    )
    from ..parallel.mesh import kernel_mesh

    mesh = kernel_mesh(up_flat.shape[0])
    if mesh is not None:
        return _fused_dp(mesh, interpret, eps, *args)
    return _fused(interpret, eps, *args)
