"""HF ``SamModel`` checkpoint → TPU-native parameter pytree converter.

The reference loads weights with ``SamModel.from_pretrained(base_model)``
(octsam/models/training_utils.py:273-280) and fine-tuned ``state_dict``s
saved as ``.pt`` (octsam/models/training_utils.py:77, octsam/inference/
app.py:14-15). This module converts either form — a state_dict in memory, a
``.pt``/``.bin`` torch file, or a ``.safetensors`` file — into the NHWC
pytree layout used by ``models/sam.py``, and back (for interop export).

Conventions:
  * torch ``nn.Linear`` stores (out, in); we store (in, out)  → transpose.
  * torch convs store (out, in, kh, kw); we store HWIO (kh, kw, in, out).
  * transposed convs store (in, out, kh, kw); we store (in, kh, kw, out).
"""

from __future__ import annotations

import numpy as np

from .configs import SamConfig


def _to_numpy(t):
    if hasattr(t, "detach"):
        # .float() first: torch refuses .numpy() on bfloat16 tensors
        # (TypeError), which would make half-precision checkpoints
        # unloadable; the target dtype is f32 anyway
        t = t.detach().cpu().float().numpy()
        # copy=True: torch's .numpy() returns a zero-copy VIEW of the live
        # parameter storage — without the copy, converting from a live
        # model and then stepping its torch optimizer would silently mutate
        # the converted pytree (found via train-step parity testing).
        # (.float() already copies for non-f32 sources, but keep it
        # unconditional: a f32 source's .float() is a no-op view.)
        return np.array(t, dtype=np.float32, copy=True)
    # already numpy (safetensors / pre-converted dicts): trust the buffer,
    # no redundant copy — load_pretrained's file path otherwise duplicated
    # every tensor (~2.5 GB transient for ViT-H)
    return np.asarray(t, dtype=np.float32)


def load_state_dict(path: str, *, allow_pickled_module: bool = False) -> dict:
    """Load a torch ``.pt``/``.bin`` or ``.safetensors`` file as numpy dict.

    ``allow_pickled_module=True`` additionally accepts a whole pickled
    ``nn.Module`` (the organoid sister-project checkpoint format,
    reference: octsam/inference/app_organoid.py:12-13 —
    ``torch.load(path + ".pth")`` of a full model). Arbitrary pickles can
    execute code, so this is opt-in; plain state_dicts never need it.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickled_module:
            raise
        # Whole-module pickle: weights_only refuses it by design.
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _to_numpy(v) for k, v in sd.items()}


def _ln(sd, prefix):
    return {
        "scale": _to_numpy(sd[f"{prefix}.weight"]),
        "bias": _to_numpy(sd[f"{prefix}.bias"]),
    }


def _lin(sd, prefix):
    return {
        "w": _to_numpy(sd[f"{prefix}.weight"]).T,
        "b": _to_numpy(sd[f"{prefix}.bias"]),
    }


def _dec_attn(sd, prefix):
    return {
        "q": _lin(sd, f"{prefix}.q_proj"),
        "k": _lin(sd, f"{prefix}.k_proj"),
        "v": _lin(sd, f"{prefix}.v_proj"),
        "out": _lin(sd, f"{prefix}.out_proj"),
    }


def from_hf_state_dict(sd: dict, cfg: SamConfig) -> dict:
    """Convert a HF SamModel state_dict (tensors or numpy) to our pytree."""
    v = cfg.vision

    layers = []
    for i in range(v.num_layers):
        pf = f"vision_encoder.layers.{i}"
        layers.append({
            "ln1": _ln(sd, f"{pf}.layer_norm1"),
            "attn": {
                "qkv": _lin(sd, f"{pf}.attn.qkv"),
                "proj": _lin(sd, f"{pf}.attn.proj"),
                "rel_pos_h": _to_numpy(sd[f"{pf}.attn.rel_pos_h"]),
                "rel_pos_w": _to_numpy(sd[f"{pf}.attn.rel_pos_w"]),
            },
            "ln2": _ln(sd, f"{pf}.layer_norm2"),
            "mlp1": _lin(sd, f"{pf}.mlp.lin1"),
            "mlp2": _lin(sd, f"{pf}.mlp.lin2"),
        })

    vision = {
        "patch_embed": {
            "w": _to_numpy(
                sd["vision_encoder.patch_embed.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "b": _to_numpy(sd["vision_encoder.patch_embed.projection.bias"]),
        },
        "pos_embed": _to_numpy(sd["vision_encoder.pos_embed"]),
        "layers": layers,
        "neck": {
            "conv1_w": _to_numpy(sd["vision_encoder.neck.conv1.weight"])[
                :, :, 0, 0
            ].T,
            "ln1": _ln(sd, "vision_encoder.neck.layer_norm1"),
            "conv2_w": _to_numpy(
                sd["vision_encoder.neck.conv2.weight"]
            ).transpose(2, 3, 1, 0),
            "ln2": _ln(sd, "vision_encoder.neck.layer_norm2"),
        },
    }

    n_pe = cfg.prompt.num_point_embeddings
    prompt = {
        "point_embed": np.stack(
            [
                _to_numpy(sd[f"prompt_encoder.point_embed.{i}.weight"])[0]
                for i in range(n_pe)
            ]
        ),
        "not_a_point": _to_numpy(sd["prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask": _to_numpy(sd["prompt_encoder.no_mask_embed.weight"])[0],
        "mask_embed": {
            "conv1": {
                "w": _to_numpy(
                    sd["prompt_encoder.mask_embed.conv1.weight"]
                ).transpose(2, 3, 1, 0),
                "b": _to_numpy(sd["prompt_encoder.mask_embed.conv1.bias"]),
            },
            "ln1": _ln(sd, "prompt_encoder.mask_embed.layer_norm1"),
            "conv2": {
                "w": _to_numpy(
                    sd["prompt_encoder.mask_embed.conv2.weight"]
                ).transpose(2, 3, 1, 0),
                "b": _to_numpy(sd["prompt_encoder.mask_embed.conv2.bias"]),
            },
            "ln2": _ln(sd, "prompt_encoder.mask_embed.layer_norm2"),
            "conv3": {
                "w": _to_numpy(
                    sd["prompt_encoder.mask_embed.conv3.weight"]
                ).transpose(2, 3, 1, 0),
                "b": _to_numpy(sd["prompt_encoder.mask_embed.conv3.bias"]),
            },
        },
    }

    d = cfg.decoder
    tw_layers = []
    for i in range(d.num_layers):
        pf = f"mask_decoder.transformer.layers.{i}"
        tw_layers.append({
            "self_attn": _dec_attn(sd, f"{pf}.self_attn"),
            "ln1": _ln(sd, f"{pf}.layer_norm1"),
            "cross_t2i": _dec_attn(sd, f"{pf}.cross_attn_token_to_image"),
            "ln2": _ln(sd, f"{pf}.layer_norm2"),
            "mlp1": _lin(sd, f"{pf}.mlp.lin1"),
            "mlp2": _lin(sd, f"{pf}.mlp.lin2"),
            "ln3": _ln(sd, f"{pf}.layer_norm3"),
            "cross_i2t": _dec_attn(sd, f"{pf}.cross_attn_image_to_token"),
            "ln4": _ln(sd, f"{pf}.layer_norm4"),
        })

    nmt = d.num_mask_tokens
    hyper = {
        "w1": np.stack([
            _to_numpy(
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.proj_in.weight"]
            ).T
            for i in range(nmt)
        ]),
        "b1": np.stack([
            _to_numpy(
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.proj_in.bias"]
            )
            for i in range(nmt)
        ]),
        "w2": np.stack([
            _to_numpy(
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.0.weight"]
            ).T
            for i in range(nmt)
        ]),
        "b2": np.stack([
            _to_numpy(
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.0.bias"]
            )
            for i in range(nmt)
        ]),
        "w3": np.stack([
            _to_numpy(
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.proj_out.weight"]
            ).T
            for i in range(nmt)
        ]),
        "b3": np.stack([
            _to_numpy(
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.proj_out.bias"]
            )
            for i in range(nmt)
        ]),
    }

    iou_head = {"l0": _lin(sd, "mask_decoder.iou_prediction_head.proj_in")}
    for i in range(1, d.iou_head_depth - 1):
        iou_head[f"l{i}"] = _lin(
            sd, f"mask_decoder.iou_prediction_head.layers.{i - 1}"
        )
    iou_head[f"l{d.iou_head_depth - 1}"] = _lin(
        sd, "mask_decoder.iou_prediction_head.proj_out"
    )

    decoder = {
        "iou_token": _to_numpy(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _to_numpy(sd["mask_decoder.mask_tokens.weight"]),
        "transformer": {
            "layers": tw_layers,
            "final_attn": _dec_attn(
                sd, "mask_decoder.transformer.final_attn_token_to_image"
            ),
            "ln_final": _ln(sd, "mask_decoder.transformer.layer_norm_final_attn"),
        },
        "upscale": {
            "ct1_w": _to_numpy(sd["mask_decoder.upscale_conv1.weight"]).transpose(
                0, 2, 3, 1
            ),
            "ct1_b": _to_numpy(sd["mask_decoder.upscale_conv1.bias"]),
            "ln": _ln(sd, "mask_decoder.upscale_layer_norm"),
            "ct2_w": _to_numpy(sd["mask_decoder.upscale_conv2.weight"]).transpose(
                0, 2, 3, 1
            ),
            "ct2_b": _to_numpy(sd["mask_decoder.upscale_conv2.bias"]),
        },
        "hyper": hyper,
        "iou_head": iou_head,
    }

    shared_pe = _to_numpy(sd["shared_image_embedding.positional_embedding"])

    return {
        "vision": vision,
        "prompt": prompt,
        "decoder": decoder,
        "shared_pe": shared_pe,
    }


def from_hf_model(model, cfg: SamConfig) -> dict:
    """Convert a live ``transformers.SamModel`` instance."""
    return from_hf_state_dict(model.state_dict(), cfg)


def load_pretrained(path: str, cfg: SamConfig, *,
                    allow_pickled_module: bool = False) -> dict:
    """Load an HF SAM checkpoint file (torch or safetensors) from disk.

    ``allow_pickled_module=True`` opts in to whole-pickled-module ``.pth``
    files (see ``load_state_dict``)."""
    return from_hf_state_dict(
        load_state_dict(path, allow_pickled_module=allow_pickled_module), cfg
    )


def to_hf_state_dict(params: dict, cfg: SamConfig) -> dict:
    """Reverse conversion: our pytree → HF SamModel state_dict (numpy).

    Enables exporting fine-tuned checkpoints in the reference's ``.pt``
    interchange format (training_utils.py:77) via ``torch.save``.
    """
    sd: dict = {}

    def put_lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_attn(prefix, p):
        put_lin(f"{prefix}.q_proj", p["q"])
        put_lin(f"{prefix}.k_proj", p["k"])
        put_lin(f"{prefix}.v_proj", p["v"])
        put_lin(f"{prefix}.out_proj", p["out"])

    v = params["vision"]
    sd["vision_encoder.patch_embed.projection.weight"] = np.asarray(
        v["patch_embed"]["w"]).transpose(3, 2, 0, 1)
    sd["vision_encoder.patch_embed.projection.bias"] = np.asarray(
        v["patch_embed"]["b"])
    sd["vision_encoder.pos_embed"] = np.asarray(v["pos_embed"])
    for i, lp in enumerate(v["layers"]):
        pf = f"vision_encoder.layers.{i}"
        put_ln(f"{pf}.layer_norm1", lp["ln1"])
        put_lin(f"{pf}.attn.qkv", lp["attn"]["qkv"])
        put_lin(f"{pf}.attn.proj", lp["attn"]["proj"])
        sd[f"{pf}.attn.rel_pos_h"] = np.asarray(lp["attn"]["rel_pos_h"])
        sd[f"{pf}.attn.rel_pos_w"] = np.asarray(lp["attn"]["rel_pos_w"])
        put_ln(f"{pf}.layer_norm2", lp["ln2"])
        put_lin(f"{pf}.mlp.lin1", lp["mlp1"])
        put_lin(f"{pf}.mlp.lin2", lp["mlp2"])
    sd["vision_encoder.neck.conv1.weight"] = np.asarray(
        v["neck"]["conv1_w"]).T[:, :, None, None]
    put_ln("vision_encoder.neck.layer_norm1", v["neck"]["ln1"])
    sd["vision_encoder.neck.conv2.weight"] = np.asarray(
        v["neck"]["conv2_w"]).transpose(3, 2, 0, 1)
    put_ln("vision_encoder.neck.layer_norm2", v["neck"]["ln2"])

    pr = params["prompt"]
    for i in range(cfg.prompt.num_point_embeddings):
        sd[f"prompt_encoder.point_embed.{i}.weight"] = np.asarray(
            pr["point_embed"][i])[None]
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(
        pr["not_a_point"])[None]
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(pr["no_mask"])[None]
    for name, ours in (("conv1", "conv1"), ("conv2", "conv2"), ("conv3", "conv3")):
        sd[f"prompt_encoder.mask_embed.{name}.weight"] = np.asarray(
            pr["mask_embed"][ours]["w"]).transpose(3, 2, 0, 1)
        sd[f"prompt_encoder.mask_embed.{name}.bias"] = np.asarray(
            pr["mask_embed"][ours]["b"])
    put_ln("prompt_encoder.mask_embed.layer_norm1", pr["mask_embed"]["ln1"])
    put_ln("prompt_encoder.mask_embed.layer_norm2", pr["mask_embed"]["ln2"])

    d = params["decoder"]
    sd["mask_decoder.iou_token.weight"] = np.asarray(d["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(d["mask_tokens"])
    for i, lp in enumerate(d["transformer"]["layers"]):
        pf = f"mask_decoder.transformer.layers.{i}"
        put_attn(f"{pf}.self_attn", lp["self_attn"])
        put_ln(f"{pf}.layer_norm1", lp["ln1"])
        put_attn(f"{pf}.cross_attn_token_to_image", lp["cross_t2i"])
        put_ln(f"{pf}.layer_norm2", lp["ln2"])
        put_lin(f"{pf}.mlp.lin1", lp["mlp1"])
        put_lin(f"{pf}.mlp.lin2", lp["mlp2"])
        put_ln(f"{pf}.layer_norm3", lp["ln3"])
        put_attn(f"{pf}.cross_attn_image_to_token", lp["cross_i2t"])
        put_ln(f"{pf}.layer_norm4", lp["ln4"])
    put_attn("mask_decoder.transformer.final_attn_token_to_image",
             d["transformer"]["final_attn"])
    put_ln("mask_decoder.transformer.layer_norm_final_attn",
           d["transformer"]["ln_final"])
    sd["mask_decoder.upscale_conv1.weight"] = np.asarray(
        d["upscale"]["ct1_w"]).transpose(0, 3, 1, 2)
    sd["mask_decoder.upscale_conv1.bias"] = np.asarray(d["upscale"]["ct1_b"])
    put_ln("mask_decoder.upscale_layer_norm", d["upscale"]["ln"])
    sd["mask_decoder.upscale_conv2.weight"] = np.asarray(
        d["upscale"]["ct2_w"]).transpose(0, 3, 1, 2)
    sd["mask_decoder.upscale_conv2.bias"] = np.asarray(d["upscale"]["ct2_b"])
    h = d["hyper"]
    for i in range(cfg.decoder.num_mask_tokens):
        pf = f"mask_decoder.output_hypernetworks_mlps.{i}"
        sd[f"{pf}.proj_in.weight"] = np.asarray(h["w1"][i]).T
        sd[f"{pf}.proj_in.bias"] = np.asarray(h["b1"][i])
        sd[f"{pf}.layers.0.weight"] = np.asarray(h["w2"][i]).T
        sd[f"{pf}.layers.0.bias"] = np.asarray(h["b2"][i])
        sd[f"{pf}.proj_out.weight"] = np.asarray(h["w3"][i]).T
        sd[f"{pf}.proj_out.bias"] = np.asarray(h["b3"][i])
    put_lin("mask_decoder.iou_prediction_head.proj_in", d["iou_head"]["l0"])
    for i in range(1, cfg.decoder.iou_head_depth - 1):
        put_lin(f"mask_decoder.iou_prediction_head.layers.{i - 1}",
                d["iou_head"][f"l{i}"])
    put_lin("mask_decoder.iou_prediction_head.proj_out",
            d["iou_head"][f"l{cfg.decoder.iou_head_depth - 1}"])

    sd["shared_image_embedding.positional_embedding"] = np.asarray(
        params["shared_pe"])
    sd["prompt_encoder.shared_embedding.positional_embedding"] = np.asarray(
        params["shared_pe"])
    return sd
