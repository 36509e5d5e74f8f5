"""TPU-native functional SAM (Segment Anything Model) in pure JAX.

This re-implements, from the published architecture, the three SAM submodules
the reference drives through HuggingFace ``transformers.SamModel``
(reference call sites: octsam/models/training_utils.py:55,273-280 and
octsam/inference/app.py:11-30):

  * ViTDet image encoder (windowed + global attention, decomposed relative
    position bias, convolutional neck),
  * prompt encoder (random-Fourier positional encoding, point/box/mask
    embeddings),
  * two-way-transformer mask decoder (IoU head, hypernetwork MLPs,
    transposed-conv upscaler).

Design is TPU-first rather than a torch translation:

  * NHWC activation layout end-to-end (TPU conv/native layout).
  * Parameters are plain nested dicts (pytrees) — trivially shardable with
    ``jax.sharding`` and convertible from HF checkpoints
    (see ``models/convert.py``).
  * Transposed convs in the decoder upscaler are expressed as einsum +
    reshape (pure MXU work, no scatter).
  * The per-mask-token hypernetwork MLPs are stacked into single batched
    einsums instead of a Python loop over 5 modules.
  * All shapes static; the whole forward jit-compiles to one XLA program.

Numerics match HF ``SamModel`` (f32) to ~1e-5; verified by
``tests/test_sam_parity.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .configs import DecoderConfig, SamConfig, VisionConfig

# ---------------------------------------------------------------------------
# Small building blocks
# ---------------------------------------------------------------------------


def layer_norm(x, p, eps):
    """LayerNorm over the trailing axis, computed in f32."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def linear(x, p):
    # f32 MXU accumulation, cast after the bias add: bf16-accumulate dots
    # lowered ~30% slower in-context (xplane A/B, round 2)
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def gelu(x):
    """GELU matching torch.nn.GELU / HF ACT2FN['gelu'].

    f32: exact erf form — bit-comparable to HF for the parity tests.
    bf16: tanh approximation — |erf−tanh| ≤ 5e-4 absolute, below bf16's
    ~8e-3 ulp at gelu's output scale, so the results are indistinguishable
    after the bf16 cast; erf costs +1.0 ms per encoder MLP on v5e (xplane
    A/B: 1.87 vs 0.81 ms for the mlp1 fusion, i.e. erf more than doubles
    the fusion over its matmul roofline) for zero representable benefit.
    """
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def _softmax_f32(logits):
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


# ---------------------------------------------------------------------------
# Vision encoder
# ---------------------------------------------------------------------------


def resize_rel_pos(rel_pos: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linearly resample a relative-position table to ``target_len`` rows.

    Mirrors torch ``F.interpolate(mode='linear')`` (half-pixel centers,
    align_corners=False). Identity when lengths already agree — which is the
    case for every stock SAM checkpoint at native resolution.
    """
    if rel_pos.shape[0] == target_len:
        return rel_pos
    # antialias=False: torch F.interpolate(mode='linear') never antialiases,
    # while jax.image.resize defaults to antialias=True on downscale —
    # matters only for non-stock window/grid geometry (ADVICE r1).
    return jax.image.resize(
        rel_pos, (target_len, rel_pos.shape[1]), method="linear",
        antialias=False,
    )


def rel_pos_table(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Gather per-(q,k) relative position embeddings → (q_size, k_size, dim)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    rel_pos = resize_rel_pos(rel_pos, max_rel_dist)
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[idx.astype(np.int32)]


def _decomposed_rel_pos_bias(q, rel_pos_h, rel_pos_w, hw):
    """Additive attention bias from decomposed relative positions.

    q: (B, heads, H*W, head_dim) un-scaled queries; returns
    (B, heads, H*W, H*W) bias. Matches the MViTv2-style decomposition used by
    SAM's image encoder.
    """
    h, w = hw
    b, n_heads, _, head_dim = q.shape
    rh = rel_pos_table(rel_pos_h, h, h)  # (H, H, d)
    rw = rel_pos_table(rel_pos_w, w, w)  # (W, W, d)
    q_r = q.reshape(b, n_heads, h, w, head_dim)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", q_r, rh.astype(q.dtype))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", q_r, rw.astype(q.dtype))
    bias = rel_h[..., :, None] + rel_w[..., None, :]
    return bias.reshape(b, n_heads, h * w, h * w)


# Flash-attention routing for the encoder's global layers. "auto": use the
# Pallas streaming kernel (ops/attention.py) on non-CPU backends for large
# token counts — the materialized (N, N) bias path OOMs batched 1024² inputs.
_FLASH_MODE = "auto"
# Covers SAM's 14x14=196-token windows too: measured 20% faster than the
# materialized-bias XLA path even at window scale (B=8 encoder on v5e:
# 201ms flash-everywhere vs 241ms flash-global-only).
_FLASH_MIN_TOKENS = 196


def set_flash_attention(mode: str):
    """mode ∈ {'auto', 'on', 'off', 'interpret'} (interpret: debug on CPU)."""
    global _FLASH_MODE
    assert mode in ("auto", "on", "off", "interpret")
    _FLASH_MODE = mode


def _use_flash(n_tokens: int) -> bool:
    if _FLASH_MODE == "off":
        return False
    if _FLASH_MODE in ("on", "interpret"):
        return True
    return n_tokens >= _FLASH_MIN_TOKENS and jax.default_backend() != "cpu"


def _kernel_mesh(batch_size: int):
    """Active DP kernel mesh (parallel/mesh.py), or None off the DP path."""
    from ..parallel.mesh import kernel_mesh

    return kernel_mesh(batch_size)


_FUSED_I2T = "auto"


def set_fused_i2t(mode: str):
    """mode ∈ {'auto', 'on', 'off', 'interpret'} — fused image→token
    cross-attention + residual + LN (ops/decoder_attn.py)."""
    global _FUSED_I2T
    assert mode in ("auto", "on", "off", "interpret")
    _FUSED_I2T = mode


def _use_fused_i2t(dtype, n_tok: int, internal: int, nh: int,
                   pe_batch: int) -> bool:
    from ..ops.decoder_attn import T_PAD

    if _FUSED_I2T == "off":
        return False
    ok = (n_tok <= T_PAD and internal % nh == 0 and pe_batch == 1)
    if not ok:
        return False
    if _FUSED_I2T == "interpret":
        return True
    if _FUSED_I2T == "on":  # explicit force: any dtype (no erf inside)
        return True
    # auto: bf16 on accelerator; f32 stays on the parity-suite einsum path
    return dtype == jnp.bfloat16 and jax.default_backend() != "cpu"


_FUSED_UPSCALER = "auto"


def set_fused_upscaler(mode: str):
    """mode ∈ {'auto', 'on', 'off', 'interpret'} (interpret: debug on CPU)."""
    global _FUSED_UPSCALER
    assert mode in ("auto", "on", "off", "interpret")
    _FUSED_UPSCALER = mode


def _use_fused_upscaler(n_pixels: int, dtype) -> bool:
    if _FUSED_UPSCALER == "off":
        return False
    if _FUSED_UPSCALER == "interpret":
        return True
    # bf16 only: the f32 path's erf GELU has no Mosaic lowering (the
    # interpret mode above runs it for tests); f32 stays on the einsum
    # chain, which is also what every parity suite compares against.
    if dtype != jnp.bfloat16:
        if _FUSED_UPSCALER == "on":
            import warnings

            warnings.warn(
                "set_fused_upscaler('on') ignored for non-bf16 inputs: "
                "the f32 erf GELU has no Mosaic lowering; using the XLA "
                "einsum path (use 'interpret' to force the kernel in "
                "interpreter mode)",
                stacklevel=3,
            )
        return False
    if _FUSED_UPSCALER == "on":
        return True
    # auto: TPU only, and only when the grid is big enough for the row
    # blocks to amortize (the XLA einsum path is fine at toy sizes)
    return n_pixels >= 1024 and jax.default_backend() != "cpu"


_FUSED_WINDOWED = "auto"


def set_fused_windowed(mode: str):
    """mode ∈ {'auto', 'on', 'off', 'interpret'} — windowed attention over
    spread image-layout qkv with in-kernel window bookkeeping (round 5
    experiment): the window partition/unpartition relayouts (pad + 6-D
    transpose copies + slice, ~1.3 ms/layer at ViT-B bs 8) never touch
    HBM. MEASURED NET-NEGATIVE on v5e and therefore 'auto' resolves to
    OFF: the attention+qkv+spread core wins 0.9 ms/layer over the
    partitioned route, but building the rel-pos factor tensors in image
    space costs 1.2-1.75 ms/layer vs 0.55 partitioned (x-batched q
    transpose + 14-lane 5-D spread lowered as while/DUS chains), a
    structural loss that eats the win — full A/B table in
    docs/ROADMAP.md. Kept parity-tested ('on'/'interpret') as the record.
    Forward-only; encoder training (remat) keeps the partitioned
    custom-VJP route."""
    global _FUSED_WINDOWED
    assert mode in ("auto", "on", "off", "interpret")
    _FUSED_WINDOWED = mode


def _use_fused_windowed(cfg: VisionConfig, ws: int) -> bool:
    c = cfg.hidden_size
    if not (cfg.use_rel_pos and c // cfg.num_heads == 64
            and cfg.num_heads % 2 == 0):
        return False
    if _FUSED_WINDOWED in ("on", "interpret"):
        return True
    return False  # 'auto' == off: measured slower than the partitioned route


def _windowed_attention_image(x_ln, p, cfg: VisionConfig, ws: int):
    """Windowed MHSA on (B, H, W, C) LN output without the window-partition
    transposes: flat qkv matmul over the REAL tokens only (better MXU
    shape than the padded per-window one), then a cheap pad-reshape SPREAD
    of the W axis — window wx's ws columns at the start of a 16-column
    slot — so ops.attention.flash_attention_windowed_image can do the
    window bookkeeping with tile-aligned slices/merges only. Rel-pos
    factors are built directly in the spread layout with row/col-tiled
    tables (window row of image row r is r % ws since windows tile at ws
    strides; the col table is slot-tiled with zero phantom rows — phantom
    factors only affect dropped pad-query outputs). Output is compacted
    back (slice+reshape, no transpose) and projected. Bit-equal to the
    partitioned route (pinned in tests/test_attention.py)."""
    b, h, w, c = x_ln.shape
    n_heads = cfg.num_heads
    from ..ops.attention import _WIN_SLOT, flash_attention_windowed_image

    slot = _WIN_SLOT
    n_wx = -(-w // ws)
    w_s = n_wx * slot
    qkv_img = linear(x_ln.reshape(b, h * w, c), p["qkv"]).reshape(
        b, h, w, 3 * c)
    # SPREAD = one constant-index gather along W (a pad+reshape+pad chain
    # compiles to 4 full-tensor copy passes, ~2 ms/layer — measured).
    # Spread values at pad/phantom positions are irrelevant (the kernel
    # reconstructs reference-pad tokens from the qkv bias and masks
    # phantom slot cols), so clamped source indices are fine.
    spread_idx = np.minimum(
        (np.arange(w_s) // slot) * ws + np.minimum(np.arange(w_s) % slot,
                                                   ws - 1),
        w - 1)
    qkv_s = jnp.take(qkv_img, spread_idx, axis=2)

    rh = rel_pos_table(p["rel_pos_h"], ws, ws)
    rw = rel_pos_table(p["rel_pos_w"], ws, ws)
    rh_t = jnp.tile(rh, (-(-h // ws), 1, 1))[:h].astype(x_ln.dtype)
    rw_t = jnp.tile(rw, (n_wx, 1, 1))[:w].astype(x_ln.dtype)
    # rel factors from the UNSPREAD q (spread-layout einsums relayout the
    # big q tensor, ~1.2 ms/layer — measured); factors are small, so the
    # spread gather on them is cheap. rh|rw are lane-packed into ONE
    # tensor (halves the 14-lane-tensor copy/gather traffic — the kernel's
    # factor and selector column orders already match). Phantom-position
    # factors only feed dropped pad-query outputs.
    q_img = qkv_img[..., :c].reshape(b, h, w, n_heads, 64)
    rel = jnp.take(
        jnp.concatenate(
            [jnp.einsum("bxyhc,xkc->bhxyk", q_img, rh_t),
             jnp.einsum("bxyhc,ykc->bhxyk", q_img, rw_t)], axis=-1),
        spread_idx, axis=3)
    attn_fn = partial(
        flash_attention_windowed_image, ws=ws, wdt=w, num_heads=n_heads,
        interpret=(_FUSED_WINDOWED == "interpret"
                   or _FLASH_MODE == "interpret"),
    )
    mesh = _kernel_mesh(b)
    if mesh is not None:
        # DP: shard the Mosaic call over the batch axis (GSPMD would
        # replicate it otherwise); the bias operand is replicated.
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, shard_map_kernel

        attn_fn = shard_map_kernel(
            attn_fn, mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
        )
    out_s = attn_fn(qkv_s, rel, p["qkv"]["b"])  # (B,H,W_s,C)
    # compact: inverse gather — real col x lives at slot (x//ws)*slot+x%ws
    compact_idx = (np.arange(w) // ws) * slot + np.arange(w) % ws
    out = jnp.take(out_s, compact_idx, axis=2)
    return linear(out.reshape(b, h * w, c), p["proj"]).reshape(b, h, w, c)


def vision_attention(x, p, cfg: VisionConfig):
    """Multi-head self-attention with optional decomposed rel-pos bias.

    x: (B, H, W, C) — B is batch*num_windows for windowed layers.
    """
    b, h, w, c = x.shape
    n_heads = cfg.num_heads
    head_dim = c // n_heads
    qkv_flat = linear(x.reshape(b, h * w, c), p["qkv"])  # (B, HW, 3C)

    if (cfg.use_rel_pos and _use_flash(h * w)
            and head_dim == 64 and n_heads % 2 == 0):
        # Transpose-free path: the packed kernel reads the fused qkv
        # projection and writes token-order output directly — the
        # (B, heads, N, d) layout copies below cost 26% of encoder device
        # time in round 1 (docs/ROADMAP.md). Differentiable via custom VJP
        # (flash-style blockwise backward), so trainable='all' encoder
        # fine-tuning stays on this path too.
        from ..ops.attention import packed_attention_vjp

        rh = rel_pos_table(p["rel_pos_h"], h, h)  # (H, H, d)
        rw = rel_pos_table(p["rel_pos_w"], w, w)
        q_nat = qkv_flat[:, :, :c].reshape(b, h, w, n_heads, head_dim)
        rel_h = jnp.einsum(
            "bxyhc,xkc->bhxyk", q_nat, rh.astype(x.dtype)
        ).reshape(b, n_heads, h * w, h)
        rel_w = jnp.einsum(
            "bxyhc,ykc->bhxyk", q_nat, rw.astype(x.dtype)
        ).reshape(b, n_heads, h * w, w)
        attn_fn = packed_attention_vjp(
            hw=(h, w), num_heads=n_heads,
            interpret=(_FLASH_MODE == "interpret"),
        )
        mesh = _kernel_mesh(b)
        if mesh is not None:
            # Under data parallelism the Mosaic custom call must be
            # shard_map'ed over the batch axis — GSPMD would otherwise
            # replicate it (parallel/mesh.py kernel-mesh note). All three
            # operands are batch-leading and gradients flow only to them,
            # so no cross-shard reductions are needed.
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, shard_map_kernel

            attn_fn = shard_map_kernel(
                attn_fn, mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
            )
        out = attn_fn(qkv_flat, rel_h, rel_w)
        return linear(out.reshape(b, h, w, c), p["proj"])

    qkv = qkv_flat.reshape(b, h * w, 3, n_heads, head_dim)  # free reshape

    q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, HW, heads, d)
    q = q.transpose(0, 2, 1, 3)  # (B, heads, HW, d)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if cfg.use_rel_pos and _use_flash(h * w):
        from ..ops.attention import flash_attention_relpos

        rh = rel_pos_table(p["rel_pos_h"], h, h)  # (H, H, d)
        rw = rel_pos_table(p["rel_pos_w"], w, w)
        q_r = q.reshape(b, n_heads, h, w, head_dim)
        rel_h = jnp.einsum("bnhwc,hkc->bnhwk", q_r, rh.astype(q.dtype))
        rel_w = jnp.einsum("bnhwc,wkc->bnhwk", q_r, rw.astype(q.dtype))
        bhn = b * n_heads
        out = flash_attention_relpos(
            q.reshape(bhn, h * w, head_dim),
            k.reshape(bhn, h * w, head_dim),
            v.reshape(bhn, h * w, head_dim),
            rel_h.reshape(bhn, h * w, h),
            rel_w.reshape(bhn, h * w, w),
            hw=(h, w),
            interpret=(_FLASH_MODE == "interpret"),
        )
        out = out.reshape(b, n_heads, h * w, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    else:
        logits = jnp.einsum(
            "bnqd,bnkd->bnqk", q * (head_dim**-0.5), k,
            preferred_element_type=jnp.float32,
        )
        if cfg.use_rel_pos:
            logits = logits + _decomposed_rel_pos_bias(
                q, p["rel_pos_h"], p["rel_pos_w"], (h, w)
            ).astype(logits.dtype)
        attn = _softmax_f32(logits).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return linear(out, p["proj"])


def window_partition(x, window_size):
    """(B, H, W, C) → (B*nW, ws, ws, C) with bottom/right zero padding."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = h + pad_h, w + pad_w
    x = x.reshape(b, ph // window_size, window_size, pw // window_size, window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size, window_size, c), (ph, pw)


def window_unpartition(windows, window_size, padded_hw, hw):
    ph, pw = padded_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((ph // window_size) * (pw // window_size))
    x = windows.reshape(
        b, ph // window_size, pw // window_size, window_size, window_size, c
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
    return x[:, :h, :w, :]


def vision_layer(x, p, cfg: VisionConfig, window_size: int,
                 fused_win: bool = False):
    shortcut = x
    x = layer_norm(x, p["ln1"], cfg.layer_norm_eps)
    if window_size > 0 and fused_win and _use_fused_windowed(
            cfg, window_size):
        x = _windowed_attention_image(x, p["attn"], cfg, window_size)
    else:
        if window_size > 0:
            hw = (x.shape[1], x.shape[2])
            x, padded_hw = window_partition(x, window_size)
        x = vision_attention(x, p["attn"], cfg)
        if window_size > 0:
            x = window_unpartition(x, window_size, padded_hw, hw)
    x = shortcut + x
    y = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
    # Flat 2-D token matmuls: XLA tiles (B·H·W, C) dots onto the MXU better
    # than the 4-D 1x1-convolution form (in-context xplane A/B).
    b_, h_, w_, c_ = y.shape
    y = y.reshape(b_ * h_ * w_, c_)
    y = linear(gelu(linear(y, p["mlp1"])), p["mlp2"])
    return x + y.reshape(b_, h_, w_, c_)


def encode_image(params, pixel_values, cfg: SamConfig, *, remat: bool = False):
    """Run the ViTDet encoder.

    pixel_values: (B, H, W, 3) NHWC, already preprocessed (normalized, padded
    to cfg.vision.image_size).
    Returns image embeddings (B, G, G, output_channels), NHWC.
    remat=True checkpoints each transformer layer — required memory headroom
    for encoder fine-tuning (full backward) at 1024² inputs.
    """
    v = cfg.vision
    p = params["vision"]
    # Patch embedding as space-to-depth + matmul. XLA's conv emitter handles
    # stride-16 3-input-channel convs ~20x off roofline (3.85 ms + a 1.8 ms
    # input relayout at B=8 on v5e vs 1.7 ms total for this form, xplane A/B);
    # a non-overlapping patch conv is exactly a reshape-transpose + one dot.
    ps = v.patch_size
    bsz, ih, iw, ic = pixel_values.shape
    gh, gw = ih // ps, iw // ps
    xp = pixel_values.reshape(bsz, gh, ps, gw, ps, ic)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, gh, gw, ps * ps * ic)
    w_flat = p["patch_embed"]["w"].astype(pixel_values.dtype).reshape(
        ps * ps * ic, -1)  # HWIO rows match the (ph, pw, c) token order
    x = jnp.dot(xp, w_flat,
                preferred_element_type=jnp.float32).astype(xp.dtype)
    # cast the bias like linear() does: an f32 bias on a bf16 x would
    # silently promote the whole encoder to f32
    x = x + p["patch_embed"]["b"].astype(x.dtype)
    if v.use_abs_pos:
        x = x + p["pos_embed"].astype(x.dtype)
    for i in range(v.num_layers):
        ws = 0 if i in v.global_attn_indexes else v.window_size
        if remat:
            # Training path (encoder gradients): the fused windowed kernel
            # is forward-only, keep the partitioned custom-VJP route.
            x = jax.checkpoint(
                partial(vision_layer, cfg=v, window_size=ws)
            )(x, p["layers"][i])
        else:
            x = vision_layer(x, p["layers"][i], v, ws, fused_win=True)
    # Neck: 1x1 conv → LN(channel) → 3x3 conv → LN(channel); both convs
    # bias-free. 1x1 conv is a channel matmul in NHWC.
    n = p["neck"]
    # f32 accumulation like every other matmul (see the policy note above):
    # bf16-accumulate dots are both less accurate and measured ~30% slower
    x = jnp.dot(x, n["conv1_w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    x = layer_norm(x, n["ln1"], 1e-6)
    x = jax.lax.conv_general_dilated(
        x,
        n["conv2_w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = layer_norm(x, n["ln2"], 1e-6)
    return x


def encode_image_microbatched(params, pixel_values, cfg: SamConfig,
                              microbatch: int = 1):
    """Encode in sequential chunks of ``microbatch`` inside one jitted
    program (lax.map), bounding peak memory to one chunk's activations.

    With the default flash-attention path the global layers stream at
    O(N·d) memory, so microbatching is no longer REQUIRED for ViT-B bs 8
    (it was when the XLA path materialized (B, heads, 4096, 4096) logits);
    it remains the memory bound for the non-flash fallback, for very large
    batches, and for larger models. Throughput cost is negligible either
    way — the MXU is saturated by a single 4096-token image.
    """
    b = pixel_values.shape[0]
    if b <= microbatch:
        return encode_image(params, pixel_values, cfg)
    if b % microbatch != 0:
        # pad to a multiple; padded outputs discarded
        pad = microbatch - b % microbatch
        pixel_values = jnp.concatenate(
            [pixel_values, jnp.zeros((pad, *pixel_values.shape[1:]),
                                     pixel_values.dtype)], axis=0)
    chunks = pixel_values.reshape(
        -1, microbatch, *pixel_values.shape[1:]
    )
    out = jax.lax.map(lambda x: encode_image(params, x, cfg), chunks)
    out = out.reshape(-1, *out.shape[2:])
    return out[:b]


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------


def _fourier_pos_encode(coords01, pe_matrix):
    """Random-Fourier positional encoding of [0,1]-normalized coordinates.

    coords01: (..., 2) → (..., 2*num_pos_feats)."""
    c = 2.0 * coords01 - 1.0
    c = jnp.dot(c.astype(pe_matrix.dtype), pe_matrix)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def image_wide_pe(params, cfg: SamConfig):
    """Dense positional encoding over the image-embedding grid.

    Returns (G, G, C): the decoder's key positional embedding."""
    g = cfg.prompt.image_embedding_size
    coords = (np.arange(g, dtype=np.float32) + 0.5) / g
    grid = np.stack(np.meshgrid(coords, coords, indexing="xy"), axis=-1)
    # grid[..., 0] = x, grid[..., 1] = y (meshgrid 'xy' ⇒ rows vary y)
    return _fourier_pos_encode(jnp.asarray(grid), params["shared_pe"])


def embed_points(params, points, labels, cfg: SamConfig, pad: bool):
    """points: (B, P, N, 2) xy in input-image space; labels: (B, P, N).

    Labels: 1 foreground, 0 background, -1 'not a point' slot, -10 padding.
    """
    p = params["prompt"]
    points = points + 0.5  # pixel-center shift
    if pad:
        b, pb, n, _ = points.shape
        points = jnp.concatenate(
            [points, jnp.zeros((b, pb, 1, 2), points.dtype)], axis=2
        )
        labels = jnp.concatenate(
            [labels, -jnp.ones((b, pb, 1), labels.dtype)], axis=2
        )
    size = cfg.prompt.input_image_size
    emb = _fourier_pos_encode(points / size, params["shared_pe"])
    lbl = labels[..., None]
    emb = jnp.where(lbl == -1, p["not_a_point"].astype(emb.dtype), emb)
    emb = jnp.where(lbl == -10, jnp.zeros_like(emb), emb)
    emb = jnp.where(lbl == 0, emb + p["point_embed"][0].astype(emb.dtype), emb)
    emb = jnp.where(lbl == 1, emb + p["point_embed"][1].astype(emb.dtype), emb)
    return emb


def embed_boxes(params, boxes, cfg: SamConfig):
    """boxes: (B, nb, 4) xyxy in input-image space → (B, nb, 2, C)."""
    p = params["prompt"]
    b, nb, _ = boxes.shape
    corners = (boxes + 0.5).reshape(b, nb, 2, 2)
    size = cfg.prompt.input_image_size
    emb = _fourier_pos_encode(corners / size, params["shared_pe"])
    offs = jnp.stack(
        [p["point_embed"][2], p["point_embed"][3]], axis=0
    ).astype(emb.dtype)
    return emb + offs[None, None]


def embed_mask_input(params, masks, cfg: SamConfig):
    """masks: (B, H, W, 1) NHWC low-res mask input → dense (B, G, G, C)."""
    p = params["prompt"]["mask_embed"]
    eps = cfg.prompt.layer_norm_eps

    def conv(x, w, b, stride):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)

    x = conv(masks, p["conv1"]["w"], p["conv1"]["b"], 2)
    x = gelu(layer_norm(x, p["ln1"], eps))
    x = conv(x, p["conv2"]["w"], p["conv2"]["b"], 2)
    x = gelu(layer_norm(x, p["ln2"], eps))
    return conv(x, p["conv3"]["w"], p["conv3"]["b"], 1)


def encode_prompts(
    params,
    cfg: SamConfig,
    batch_size: int,
    points=None,
    labels=None,
    boxes=None,
    mask_inputs=None,
    dtype=jnp.float32,
):
    """Returns (sparse (B, P, T, C), dense (B, G, G, C))."""
    sparse = None
    if points is not None:
        if labels is None:
            labels = jnp.ones(points.shape[:-1], dtype=jnp.int32)
        sparse = embed_points(params, points, labels, cfg, pad=boxes is None)
    if boxes is not None:
        box_emb = embed_boxes(params, boxes, cfg)
        sparse = (
            box_emb if sparse is None
            else jnp.concatenate([sparse, box_emb], axis=2)
        )
    g = cfg.prompt.image_embedding_size
    if mask_inputs is not None:
        dense = embed_mask_input(params, mask_inputs, cfg)
    else:
        dense = jnp.broadcast_to(
            params["prompt"]["no_mask"].astype(dtype),
            (batch_size, g, g, cfg.prompt.hidden_size),
        )
    if sparse is not None:
        sparse = sparse.astype(dtype)
    return sparse, dense.astype(dtype)


# ---------------------------------------------------------------------------
# Mask decoder
# ---------------------------------------------------------------------------


def _decoder_attention(q, k, v, p, n_heads):
    """SAM decoder attention; q/k/v: (B, N, C_model) → (B, Nq, C_model)."""
    b, nq, _ = q.shape
    q = linear(q, p["q"])
    k = linear(k, p["k"])
    v = linear(v, p["v"])
    internal = q.shape[-1]
    head_dim = internal // n_heads
    q = q.reshape(b, nq, n_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, k.shape[1], n_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, v.shape[1], n_heads, head_dim).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bnqd,bnkd->bnqk", q * (head_dim**-0.5), k,
        preferred_element_type=jnp.float32,
    )
    attn = _softmax_f32(logits).astype(v.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, internal)
    return linear(out, p["out"])


def two_way_block(queries, keys, query_pe, key_pe, p, cfg: DecoderConfig, first):
    eps = cfg.layer_norm_eps
    if first:
        # First layer: self-attention output REPLACES queries (no residual,
        # no positional embedding) — skip_first_layer_pe in the original.
        queries = _decoder_attention(
            queries, queries, queries, p["self_attn"], cfg.num_heads
        )
    else:
        q = queries + query_pe
        queries = queries + _decoder_attention(
            q, q, queries, p["self_attn"], cfg.num_heads
        )
    queries = layer_norm(queries, p["ln1"], eps)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _decoder_attention(
        q, k, keys, p["cross_t2i"], cfg.num_heads
    )
    queries = layer_norm(queries, p["ln2"], eps)

    mlp = linear(jax.nn.relu(linear(queries, p["mlp1"])), p["mlp2"])
    queries = layer_norm(queries + mlp, p["ln3"], eps)

    pp = p["cross_i2t"]
    internal = pp["q"]["w"].shape[1]
    pe_b = key_pe.shape[0] if hasattr(key_pe, "shape") else 0
    if _use_fused_i2t(keys.dtype, queries.shape[1], internal,
                      cfg.num_heads, pe_b):
        # fused per-row chain (ops/decoder_attn.py): q-projection, ≤8-token
        # multi-head attention, out-projection, residual, LN — the
        # (BP, HW, ·) intermediates never reach HBM
        from ..ops.decoder_attn import fused_i2t_ln

        tok = queries + query_pe
        keys = fused_i2t_ln(
            keys, key_pe, linear(tok, pp["k"]), linear(queries, pp["v"]),
            pp["q"], pp["out"], p["ln4"], nh=cfg.num_heads, pb=1, eps=eps,
            interpret=(_FUSED_I2T == "interpret"),
        )
        return queries, keys
    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _decoder_attention(k, q, queries, p["cross_i2t"], cfg.num_heads)
    keys = layer_norm(keys, p["ln4"], eps)
    return queries, keys


def _two_way_block_first_shared(queries, keys_img, query_pe, key_pe, p,
                                cfg: DecoderConfig, pb: int):
    """Layer-1 variant with the image side still per-IMAGE.

    Until the first image→token residual lands, the image-side tensor is
    identical across a given image's pb prompts, so its k/v projections
    (token→image) and q projection (image→token) run on (B, HW, C)
    instead of (B·pb, HW, C) — 8x fewer rows at the training geometry.
    Linear maps commute with the repeat, so the math is bit-equivalent to
    repeating first (the attention dots themselves are per-pair either
    way). The per-pair image tensor first materializes as this block's
    i2t residual — exactly where it genuinely diverges per prompt.
    """
    eps = cfg.layer_norm_eps
    nh = cfg.num_heads
    b, hw, c = keys_img.shape
    bp, t, _ = queries.shape

    queries = _decoder_attention(
        queries, queries, queries, p["self_attn"], nh
    )
    queries = layer_norm(queries, p["ln1"], eps)

    # token→image cross-attention, shared k/v projections
    q = queries + query_pe  # (BP, T, C)
    k_img = keys_img + key_pe  # (B, HW, C)
    pp = p["cross_t2i"]
    qp = linear(q, pp["q"]).reshape(b, pb * t, -1)
    kp = linear(k_img, pp["k"])
    vp = linear(keys_img, pp["v"])
    internal = qp.shape[-1]
    hd = internal // nh
    qh = qp.reshape(b, pb * t, nh, hd).transpose(0, 2, 1, 3)
    kh = kp.reshape(b, hw, nh, hd).transpose(0, 2, 1, 3)
    vh = vp.reshape(b, hw, nh, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bnqd,bnkd->bnqk", qh * (hd**-0.5), kh,
        preferred_element_type=jnp.float32,
    )
    attn = _softmax_f32(logits).astype(vh.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(bp, t, internal)
    queries = queries + linear(out, pp["out"])
    queries = layer_norm(queries, p["ln2"], eps)

    mlp = linear(jax.nn.relu(linear(queries, p["mlp1"])), p["mlp2"])
    queries = layer_norm(queries + mlp, p["ln3"], eps)

    # image→token cross-attention, shared q projection
    pp = p["cross_i2t"]
    internal_i2t = pp["q"]["w"].shape[1]
    if _use_fused_i2t(keys_img.dtype, t, internal_i2t, nh,
                      key_pe.shape[0] if hasattr(key_pe, "shape") else 0):
        # fused per-row chain; keys stays per-IMAGE at the kernel input
        # (index-mapped b // pb) and the per-pair tensor first
        # materializes as the kernel's residual output
        from ..ops.decoder_attn import fused_i2t_ln

        tok = queries + query_pe
        keys = fused_i2t_ln(
            keys_img, key_pe, linear(tok, pp["k"]),
            linear(queries, pp["v"]), pp["q"], pp["out"], p["ln4"],
            nh=nh, pb=pb, eps=eps,
            interpret=(_FUSED_I2T == "interpret"),
        )
        return queries, keys
    tok = queries + query_pe
    qp = linear(k_img, pp["q"])  # (B, HW, internal)
    kp = linear(tok, pp["k"])
    vp = linear(queries, pp["v"])
    qh = qp.reshape(b, hw, nh, hd).transpose(0, 2, 1, 3)  # (B, nh, HW, hd)
    kh = kp.reshape(b, pb, t, nh, hd).transpose(0, 1, 3, 2, 4)
    vh = vp.reshape(b, pb, t, nh, hd).transpose(0, 1, 3, 2, 4)
    logits = jnp.einsum(
        "bnqd,bpnkd->bpnqk", qh * (hd**-0.5), kh,
        preferred_element_type=jnp.float32,
    )  # (B, pb, nh, HW, T) — q broadcast over prompts, never materialized
    attn = _softmax_f32(logits).astype(vh.dtype)
    out = jnp.einsum("bpnqk,bpnkd->bpnqd", attn, vh)
    out = out.transpose(0, 1, 3, 2, 4).reshape(bp, hw, internal)
    keys = (keys_img[:, None] + linear(out, pp["out"]).reshape(
        b, pb, hw, c)).reshape(bp, hw, c)
    keys = layer_norm(keys, p["ln4"], eps)
    return queries, keys


def two_way_transformer(point_emb, image_emb, image_pe, p,
                        cfg: DecoderConfig, pb: int = 1):
    """point_emb: (BP, T, C); image_pe: broadcastable (1 or BP, HW, C);
    image_emb: (BP, HW, C), or (B, HW, C) per-image with pb > 1 (the
    repeat to per-(image,prompt) is deferred into layer 1, see
    _two_way_block_first_shared)."""
    queries, keys = point_emb, image_emb
    for i in range(cfg.num_layers):
        if i == 0 and pb > 1:
            queries, keys = _two_way_block_first_shared(
                queries, keys, point_emb, image_pe, p["layers"][0], cfg, pb
            )
            continue
        queries, keys = two_way_block(
            queries, keys, point_emb, image_pe, p["layers"][i], cfg, first=(i == 0)
        )
    q = queries + point_emb
    k = keys + image_pe
    queries = queries + _decoder_attention(
        q, k, keys, p["final_attn"], cfg.num_heads
    )
    # NB: HF's final LayerNorm uses torch default eps=1e-5 (modeling_sam.py:367)
    queries = layer_norm(queries, p["ln_final"], 1e-5)
    return queries, keys


def _upscale2x(x, w, b):
    """2x2-stride-2 transposed conv as einsum+reshape (windows don't overlap).

    x: (B, H, W, Ci); w: (Ci, 2, 2, Co) → (B, 2H, 2W, Co).
    NOTE (negative result, round 2): the lhs-dilated-conv form removed the
    (B, H, 2, W, 2, Co) interleave copies but its BACKWARD (kernel-flip
    reverses + gelu-grad fusions on the full 256² grid) cost more than it
    saved — 55.6 vs 52.5 ms cached-step device time. Keep the einsum."""
    bsz, h, ww, _ = x.shape
    co = w.shape[-1]
    y = jnp.einsum("bhwc,cdeo->bhdweo", x, w.astype(x.dtype))
    y = y.reshape(bsz, h, 2, ww, 2, co).reshape(bsz, 2 * h, 2 * ww, co)
    return y + b.astype(y.dtype)


def decode_masks(
    params,
    cfg: SamConfig,
    image_embeddings,  # (B, G, G, C) NHWC — dense prompt NOT yet added
    image_pe,  # (G, G, C)
    sparse_prompt,  # (B, P, T, C) or None
    dense_prompt,  # (B, G, G, C)
    multimask_output: bool = False,
    blocked: bool = False,
):
    """Returns (masks (B, P, M, 4G, 4G), iou_pred (B, P, M)).

    blocked=True returns masks as (B, P, M, G, G, 2, 2, 2, 2) — the
    upscaler's natural two-level block layout, pixel (4h+2d+f, 4w+2e+g) at
    index [h, w, d, e, f, g]. Row-major regrouping to (h, d, f)(w, e, g)
    reproduces the natural image exactly; the training path instead feeds
    it straight to ops/postprocess.postprocess_masks_blocked, which folds
    the regroup into its resize-operator einsum. This keeps every tensor in
    the chain in the axis order the MXU dots produce — the natural-order
    path's interleave reshape after each _upscale2x costs ~6 ms/step of
    pure layout copies at B=8, P=8 (xplane, docs/ROADMAP.md)."""
    d = cfg.decoder
    p = params["decoder"]
    b, g, _, c = image_embeddings.shape
    pb = sparse_prompt.shape[1] if sparse_prompt is not None else 1

    out_tokens = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    out_tokens = jnp.broadcast_to(
        out_tokens.astype(image_embeddings.dtype),
        (b, pb, out_tokens.shape[0], c),
    )
    tokens = (
        jnp.concatenate([out_tokens, sparse_prompt], axis=2)
        if sparse_prompt is not None
        else out_tokens
    )
    n_tok = tokens.shape[2]

    src = (image_embeddings + dense_prompt).reshape(b, g * g, c)
    pe = image_pe.reshape(1, g * g, c).astype(src.dtype)
    if pb == 1:
        # per-image == per-pair; run the uniform path
        queries, keys = two_way_transformer(
            tokens.reshape(b, n_tok, c), src, pe, p["transformer"], d
        )
    else:
        # src stays per-IMAGE; the repeat to (B·pb, HW, C) happens inside
        # layer 1 at the first image→token residual (where the image side
        # genuinely diverges per prompt) — the shared k/v/q projections
        # before that point run on 1/pb of the rows.
        queries, keys = two_way_transformer(
            tokens.reshape(b * pb, n_tok, c), src, pe, p["transformer"], d,
            pb=pb,
        )
    iou_token_out = queries[:, 0, :]
    mask_tokens_out = queries[:, 1 : 1 + d.num_mask_tokens, :]

    hp = p["hyper"]
    h = jax.nn.relu(
        jnp.einsum("btc,tcd->btd", mask_tokens_out, hp["w1"]) + hp["b1"]
    )
    h = jax.nn.relu(jnp.einsum("btc,tcd->btd", h, hp["w2"]) + hp["b2"])
    hyper_in = jnp.einsum("btc,tcd->btd", h, hp["w3"]) + hp["b3"]
    # hyper_in: (BP, M+1, C/8); slice the requested mask tokens BEFORE the
    # per-pixel einsum — multimask_output=False touches 1 of 4 tokens, so
    # the (BP, 4G·4G) mask product and everything downstream shrinks 4x.
    sl = slice(1, None) if multimask_output else slice(0, 1)
    hyper_sl = hyper_in[:, sl]
    n_out = hyper_sl.shape[1]

    up = keys.reshape(b * pb, g, g, c)
    if blocked and _use_fused_upscaler(g * g, up.dtype):
        # Fused Pallas chain (ops/upscaler.py): convT→LN→GELU→convT→GELU→
        # ⟨·,hyper⟩ per VMEM row block; the (BP, 4G, 4G, C/8) intermediate
        # (268 MB at training geometry) never reaches HBM, forward or
        # backward. Output lanes (d, e, f, g) == the blocked trailing axes.
        from ..ops.upscaler import upscale_hyper_masks

        mf = upscale_hyper_masks(
            up.reshape(b * pb, g * g, c), p["upscale"], hyper_sl,
            interpret=(_FUSED_UPSCALER == "interpret"),
        )  # (BP, G·G, n_out·16) f32
        mf = mf.reshape(b, pb, g, g, n_out, 2, 2, 2, 2)
        masks = jnp.moveaxis(mf, 4, 2)  # (b, pb, n_out, g, g, 2, 2, 2, 2)
    elif blocked:
        # Two-level blocked upscale: every step below is the axis order the
        # MXU dot naturally emits (lhs-free then rhs-free), so XLA inserts
        # no layout copies anywhere in the chain.
        # NOTE (negative result): rewriting these einsums as flat 2-D
        # jnp.dot + reshape made the step 64% SLOWER (52.5 vs 31.9 ms) —
        # XLA assigns the 8-D tensors non-row-major layouts and
        # materializes the flattening reshape (3.5 ms) plus extra copies.
        # The einsum/conv form cooperates with those layouts; keep it.
        w1 = p["upscale"]["ct1_w"].astype(up.dtype)
        u1 = (jnp.einsum("bhwc,cdeo->bhwdeo", up, w1)
              + p["upscale"]["ct1_b"].astype(up.dtype))
        u1 = gelu(layer_norm(u1, p["upscale"]["ln"], 1e-6))
        w2 = p["upscale"]["ct2_w"].astype(up.dtype)
        u2 = jnp.einsum("bhwdec,cfgo->bhwdefgo", u1, w2)
        u2 = gelu(u2 + p["upscale"]["ct2_b"].astype(u2.dtype))
        masks = jnp.einsum(
            "btc,bhwdefgc->bthwdefg", hyper_sl, u2,
            preferred_element_type=jnp.float32,
        )
        masks = masks.reshape(b, pb, n_out, g, g, 2, 2, 2, 2)
    else:
        up = _upscale2x(up, p["upscale"]["ct1_w"], p["upscale"]["ct1_b"])
        up = gelu(layer_norm(up, p["upscale"]["ln"], 1e-6))
        up = gelu(_upscale2x(up, p["upscale"]["ct2_w"], p["upscale"]["ct2_b"]))
        # up: (BP, 4G, 4G, C/8)
        g4 = 4 * g
        masks = jnp.einsum(
            "btc,bpc->btp", hyper_sl, up.reshape(b * pb, g4 * g4, -1),
            preferred_element_type=jnp.float32,
        )
        masks = masks.reshape(b, pb, n_out, g4, g4)

    ih = p["iou_head"]
    # all-but-last layers with relu, then the output layer — written so a
    # depth-1 head applies l0 exactly once (the previous hardcoded
    # relu(l0) prologue applied it twice for depth 1)
    y = iou_token_out
    for i in range(d.iou_head_depth - 1):
        y = jax.nn.relu(linear(y, ih[f"l{i}"]))
    iou_pred = linear(y, ih[f"l{d.iou_head_depth - 1}"])
    iou_pred = iou_pred.reshape(b, pb, d.num_mask_tokens)

    return masks, iou_pred[:, :, sl]


# ---------------------------------------------------------------------------
# End-to-end forward
# ---------------------------------------------------------------------------


def sam_forward(
    params,
    cfg: SamConfig,
    pixel_values=None,  # (B, H, W, 3) NHWC
    image_embeddings=None,  # (B, G, G, C) — alternative to pixel_values
    points=None,
    labels=None,
    boxes=None,
    mask_inputs=None,
    multimask_output: bool = False,
):
    """Full SAM forward. Mirrors HF SamModel.forward's contract
    (modeling_sam.py:1202) with NHWC tensors; pred_masks are the low-res
    (256², for ViT-B geometry) logits before the reference's 3-step
    postprocess (training_utils.py:57-59 → ops/postprocess.py here)."""
    if image_embeddings is None:
        image_embeddings = encode_image(params, pixel_values, cfg)
    b = image_embeddings.shape[0]
    sparse, dense = encode_prompts(
        params,
        cfg,
        b,
        points=points,
        labels=labels,
        boxes=boxes,
        mask_inputs=mask_inputs,
        dtype=image_embeddings.dtype,
    )
    pe = image_wide_pe(params, cfg)
    masks, iou = decode_masks(
        params, cfg, image_embeddings, pe, sparse, dense, multimask_output
    )
    return {"pred_masks": masks, "iou_scores": iou,
            "image_embeddings": image_embeddings}


# ---------------------------------------------------------------------------
# Initialization (for tests / training from scratch)
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, std=0.02):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (d_in, d_out), jnp.float32) * std,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_params(key, cfg: SamConfig):
    """Random initialization (HF-style scales); mainly for tests."""
    v, pr, d = cfg.vision, cfg.prompt, cfg.decoder
    keys = iter(jax.random.split(key, 4096))

    def nk():
        return next(keys)

    vision_layers = []
    for i in range(v.num_layers):
        ws = v.window_size if i not in v.global_attn_indexes else v.grid_size
        vision_layers.append({
            "ln1": _init_ln(v.hidden_size),
            "attn": {
                "qkv": _init_linear(nk(), v.hidden_size, 3 * v.hidden_size),
                "proj": _init_linear(nk(), v.hidden_size, v.hidden_size),
                "rel_pos_h": jnp.zeros((2 * ws - 1, v.head_dim), jnp.float32),
                "rel_pos_w": jnp.zeros((2 * ws - 1, v.head_dim), jnp.float32),
            },
            "ln2": _init_ln(v.hidden_size),
            "mlp1": _init_linear(nk(), v.hidden_size, v.mlp_dim),
            "mlp2": _init_linear(nk(), v.mlp_dim, v.hidden_size),
        })
    vision = {
        "patch_embed": {
            "w": jax.random.normal(
                nk(), (v.patch_size, v.patch_size, v.num_channels, v.hidden_size),
                jnp.float32) * 0.02,
            "b": jnp.zeros((v.hidden_size,), jnp.float32),
        },
        "pos_embed": jnp.zeros(
            (1, v.grid_size, v.grid_size, v.hidden_size), jnp.float32),
        "layers": vision_layers,
        "neck": {
            "conv1_w": jax.random.normal(
                nk(), (v.hidden_size, v.output_channels), jnp.float32) * 0.02,
            "ln1": _init_ln(v.output_channels),
            "conv2_w": jax.random.normal(
                nk(), (3, 3, v.output_channels, v.output_channels),
                jnp.float32) * 0.02,
            "ln2": _init_ln(v.output_channels),
        },
    }

    mic = pr.mask_input_channels

    def conv_p(k, kh, kw, ci, co):
        return {
            "w": jax.random.normal(k, (kh, kw, ci, co), jnp.float32) * 0.02,
            "b": jnp.zeros((co,), jnp.float32),
        }

    prompt = {
        "point_embed": jax.random.normal(
            nk(), (pr.num_point_embeddings, pr.hidden_size), jnp.float32) * 0.02,
        "not_a_point": jax.random.normal(nk(), (pr.hidden_size,), jnp.float32) * 0.02,
        "no_mask": jax.random.normal(nk(), (pr.hidden_size,), jnp.float32) * 0.02,
        "mask_embed": {
            "conv1": conv_p(nk(), 2, 2, 1, mic // 4),
            "ln1": _init_ln(mic // 4),
            "conv2": conv_p(nk(), 2, 2, mic // 4, mic),
            "ln2": _init_ln(mic),
            "conv3": conv_p(nk(), 1, 1, mic, pr.hidden_size),
        },
    }

    def attn_p(downsample):
        internal = d.hidden_size // downsample
        return {
            "q": _init_linear(nk(), d.hidden_size, internal),
            "k": _init_linear(nk(), d.hidden_size, internal),
            "v": _init_linear(nk(), d.hidden_size, internal),
            "out": _init_linear(nk(), internal, d.hidden_size),
        }

    tw_layers = []
    for _ in range(d.num_layers):
        tw_layers.append({
            "self_attn": attn_p(1),
            "ln1": _init_ln(d.hidden_size),
            "cross_t2i": attn_p(d.attention_downsample_rate),
            "ln2": _init_ln(d.hidden_size),
            "mlp1": _init_linear(nk(), d.hidden_size, d.mlp_dim),
            "mlp2": _init_linear(nk(), d.mlp_dim, d.hidden_size),
            "ln3": _init_ln(d.hidden_size),
            "cross_i2t": attn_p(d.attention_downsample_rate),
            "ln4": _init_ln(d.hidden_size),
        })

    c8 = d.hidden_size // 8
    nmt = d.num_mask_tokens
    hyper = {
        "w1": jax.random.normal(nk(), (nmt, d.hidden_size, d.hidden_size), jnp.float32) * 0.02,
        "b1": jnp.zeros((nmt, d.hidden_size), jnp.float32),
        "w2": jax.random.normal(nk(), (nmt, d.hidden_size, d.hidden_size), jnp.float32) * 0.02,
        "b2": jnp.zeros((nmt, d.hidden_size), jnp.float32),
        "w3": jax.random.normal(nk(), (nmt, d.hidden_size, c8), jnp.float32) * 0.02,
        "b3": jnp.zeros((nmt, c8), jnp.float32),
    }
    iou_head = {}
    dims = (
        [d.hidden_size]
        + [d.iou_head_hidden_dim] * (d.iou_head_depth - 1)
        + [nmt]
    )
    for i in range(d.iou_head_depth):
        iou_head[f"l{i}"] = _init_linear(nk(), dims[i], dims[i + 1])

    decoder = {
        "iou_token": jax.random.normal(nk(), (1, d.hidden_size), jnp.float32) * 0.02,
        "mask_tokens": jax.random.normal(nk(), (nmt, d.hidden_size), jnp.float32) * 0.02,
        "transformer": {
            "layers": tw_layers,
            "final_attn": attn_p(d.attention_downsample_rate),
            "ln_final": _init_ln(d.hidden_size),
        },
        "upscale": {
            "ct1_w": jax.random.normal(nk(), (d.hidden_size, 2, 2, d.hidden_size // 4), jnp.float32) * 0.02,
            "ct1_b": jnp.zeros((d.hidden_size // 4,), jnp.float32),
            "ln": _init_ln(d.hidden_size // 4),
            "ct2_w": jax.random.normal(nk(), (d.hidden_size // 4, 2, 2, c8), jnp.float32) * 0.02,
            "ct2_b": jnp.zeros((c8,), jnp.float32),
        },
        "hyper": hyper,
        "iou_head": iou_head,
    }

    return {
        "vision": vision,
        "prompt": prompt,
        "decoder": decoder,
        "shared_pe": (pr.hidden_size // 2) ** 0.5
        * jax.random.normal(nk(), (2, cfg.num_pos_feats), jnp.float32),
    }
