"""Real-weights validation — fire the moment actual SAM weights exist.

Every parity artifact in this repo (full-scale ViT-B forward <=1e-4,
22-step loss-curve lock, convergence Dice parity) uses *randomized* HF
weights because this environment has zero egress and no checkpoint on
disk. This script is the ready-to-run counterpart for the moment
``facebook/sam-vit-base`` weights (reference load path:
octsam/models/training_utils.py:273-280, octsam/inference/app.py:11-15)
become available — locally or via network:

    python tools/validate_real_weights.py \
        [--weights /path/to/sam-vit-base(.pt|.safetensors|HF dir)] \
        [--base_model facebook/sam-vit-base] [--report report.json]

It performs, and reports as JSON:

1. **Convert** — load the checkpoint through models/convert.py into our
   JAX parameter tree.
2. **Golden masks** — a deterministic OCT-shaped synthetic image with one
   box and one point prompt through BOTH stacks (live HF ``SamModel`` when
   torch+transformers can load the same weights, else recorded goldens via
   --golden): asserts logits parity (atol) and thresholded-mask IoU.
3. **Fine-tune** — a 2-epoch MedSAM-style decoder fine-tune on the
   synthetic blob dataset (same recipe as tests/test_training.py):
   asserts the Dice+CE loss decreases from real-weight initialization.

Exit code 0 = all performed checks passed. The script path itself is kept
green with a mocked tiny checkpoint in
tests/test_inference.py::test_validate_real_weights_script.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_oct_image(hw=(496, 512), seed=7) -> np.ndarray:
    """Deterministic OCT-like grayscale image: horizontal layered bands
    with smooth undulation + speckle (the reference's dataset geometry,
    preprocessing_utils.py:76)."""
    h, w = hw
    rng = np.random.default_rng(seed)
    yy = np.arange(h)[:, None].astype(np.float32)
    xx = np.arange(w)[None, :].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for k, (center, thick, bright) in enumerate(
        [(0.3, 0.05, 180), (0.42, 0.04, 120), (0.55, 0.06, 200),
         (0.68, 0.05, 90)]
    ):
        c = center * h + 12 * np.sin(2 * np.pi * xx / w + k)
        band = np.exp(-((yy - c) ** 2) / (2 * (thick * h) ** 2))
        img += bright * band
    img += rng.normal(0, 8, (h, w)).astype(np.float32)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


def golden_prompts(hw=(496, 512)):
    h, w = hw
    box = np.array([0.1 * w, 0.25 * h, 0.9 * w, 0.45 * h], np.float32)
    point = np.array([0.5 * w, 0.55 * h], np.float32)
    return box, point


def run_model(params, cfg, image, box, point):
    """Our stack: processor-equivalent preprocess + forward + postprocess
    via the serving engine (one jitted dispatch per prompt, f32).
    Returns dict of f32 prob maps + binary masks."""
    import jax

    from dilabhelmholtzoct_tpu.inference.engine import SegmentationEngine

    params = jax.tree_util.tree_map(np.asarray, params)
    eng = SegmentationEngine(params, cfg)
    _, probs_box = eng.segment(image, box.reshape(4), prompt_type="bbox")
    _, probs_pt = eng.segment(image, point.reshape(2), prompt_type="points")
    probs_box = np.asarray(probs_box[0], np.float32)
    probs_pt = np.asarray(probs_pt[0], np.float32)
    return {
        "box_probs": probs_box,
        "point_probs": probs_pt,
        "box_mask": (probs_box > 0.5).astype(np.uint8),
        "point_mask": (probs_pt > 0.5).astype(np.uint8),
    }


def _hf_config_from(cfg):
    """transformers.SamConfig mirroring our SamConfig geometry — lets the
    golden check construct a live HF model OFFLINE from a bare state_dict
    (no hub config download needed)."""
    from transformers import SamConfig as HFSamConfig
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    v, p, d = cfg.vision, cfg.prompt, cfg.decoder
    vision = SamVisionConfig(
        hidden_size=v.hidden_size, num_hidden_layers=v.num_layers,
        num_attention_heads=v.num_heads, image_size=v.image_size,
        patch_size=v.patch_size, window_size=v.window_size,
        global_attn_indexes=list(v.global_attn_indexes), mlp_dim=v.mlp_dim,
        output_channels=v.output_channels, num_pos_feats=cfg.num_pos_feats,
    )
    prompt = SamPromptEncoderConfig(
        hidden_size=p.hidden_size, image_size=p.input_image_size,
        patch_size=p.input_image_size // p.image_embedding_size,
    )
    decoder = SamMaskDecoderConfig(
        hidden_size=d.hidden_size, mlp_dim=d.mlp_dim,
        num_attention_heads=d.num_heads,
        iou_head_hidden_dim=d.iou_head_hidden_dim,
    )
    return HFSamConfig(
        vision_config=vision.to_dict(),
        prompt_encoder_config=prompt.to_dict(),
        mask_decoder_config=decoder.to_dict(),
    )


def hf_reference(weights, base_model, cfg, image, box, point):
    """Live HF SamModel end-to-end (processor + forward + postprocess +
    sigmoid>0.5), mirroring octsam/inference/app.py:17-30. Model source,
    in order: HF hub / local dir via from_pretrained; else an HF model
    built from our config with the local state_dict loaded (fully
    offline). Returns the same dict as run_model, or None when HF/torch
    cannot produce a model here."""
    try:
        import torch
        import transformers
    except ImportError:
        return None
    hf_model = None
    try:
        src = weights if weights and os.path.isdir(weights) else base_model
        hf_model = transformers.SamModel.from_pretrained(src)
    except Exception as e:
        if weights and os.path.isfile(weights):
            # offline: rebuild the architecture from our config and load
            # the raw state_dict (the reference's own load pattern,
            # training_utils.py:83-85)
            from dilabhelmholtzoct_tpu.models.convert import load_state_dict

            hf_model = transformers.SamModel(_hf_config_from(cfg))
            sd = {k: torch.tensor(np.asarray(v))
                  for k, v in load_state_dict(weights).items()}
            missing, unexpected = hf_model.load_state_dict(sd, strict=False)
            if missing:
                print(f"[real-weights] offline HF load missing keys: "
                      f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
                return None
        else:
            print(f"[real-weights] live HF model unavailable: {e}")
            return None
    hf_model.eval()
    try:
        processor = transformers.SamProcessor.from_pretrained(base_model)
    except Exception:
        from transformers.models.sam import SamImageProcessor

        size = cfg.vision.image_size
        processor = transformers.SamProcessor(SamImageProcessor(
            size={"longest_edge": size},
            pad_size={"height": size, "width": size},
        ))
    out = {}
    for kind, prompt in (("box", box), ("point", point)):
        kw = (
            {"input_boxes": [[prompt.tolist()]]} if kind == "box"
            else {"input_points": [[[prompt.tolist()]]]}
        )
        inputs = processor(image, return_tensors="pt", **kw)
        with torch.no_grad():
            res = hf_model(**inputs, multimask_output=False)
        size = cfg.vision.image_size
        masks = torch.nn.functional.interpolate(
            res.pred_masks.squeeze(2), (size, size), mode="bilinear",
            align_corners=False,
        )
        masks = masks[..., : inputs["reshaped_input_sizes"][0][0],
                      : inputs["reshaped_input_sizes"][0][1]]
        masks = torch.nn.functional.interpolate(
            masks, tuple(int(v) for v in inputs["original_sizes"][0]),
            mode="bilinear", align_corners=False,
        )
        probs = torch.sigmoid(masks)[0, 0].numpy().astype(np.float32)
        out[f"{kind}_probs"] = probs
        out[f"{kind}_mask"] = (probs > 0.5).astype(np.uint8)
    return out


def mask_iou(a, b):
    inter = float(np.sum((a > 0) & (b > 0)))
    union = float(np.sum((a > 0) | (b > 0)))
    return inter / union if union else 1.0


def finetune_check(params, cfg, base_model, epochs=2, seed=0):
    """2-epoch decoder-only Dice+CE fine-tune on synthetic blobs starting
    from the (real) weights; returns the loss history."""
    from dilabhelmholtzoct_tpu.data.store import split_and_save
    from dilabhelmholtzoct_tpu.train.trainer import TrainConfig, training

    rng = np.random.default_rng(seed)
    hw = (128, 160)
    n = 8
    images = rng.integers(0, 255, size=(n, *hw, 3), dtype=np.uint8)
    labels = np.zeros((n, *hw), np.uint8)
    for i in range(n):
        for c in range(1, 4):
            y, x = rng.integers(5, hw[0] - 30), rng.integers(5, hw[1] - 35)
            labels[i, y:y + 20, x:x + 24] = c
    with tempfile.TemporaryDirectory() as td:
        _, data_dir = split_and_save(
            images, labels, os.path.join(td, "processed"),
            test_size=0.25, shuffle=True, seed=0,
        )
        # route the REAL weights through the standard checkpoint-load path
        # (prepare_model → load_pretrained) by exporting them to a
        # reference-format .pt — the exact format the reference saves/loads
        # (training_utils.py:77,83-85)
        import torch

        from dilabhelmholtzoct_tpu.models.convert import to_hf_state_dict

        ckpt = os.path.join(td, "real_weights.pt")
        torch.save(
            {k: torch.tensor(np.asarray(v))
             for k, v in to_hf_state_dict(params, cfg).items()},
            ckpt,
        )
        config = TrainConfig(
            base_model=base_model, dataset=data_dir,
            checkpoint=os.path.join(td, "ckpt"),
            pretrained_checkpoint=ckpt,
            learning_rate=1e-4, epochs=epochs, batch_size=2, shuffle=True,
            evaluate=False, display_mode="none", compute_dtype="float32",
            buckets=(4, 8), display_name="real-weights-check", time="t0",
        )
        result = training(config)
    return [float(h["train_loss"]) for h in result["history"]]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", type=str, default=None,
                   help="local .pt/.safetensors/HF dir with real SAM "
                        "weights; default: resolve --base_model via HF hub")
    p.add_argument("--base_model", type=str,
                   default="facebook/sam-vit-base")
    p.add_argument("--report", type=str, default=None)
    p.add_argument("--golden", type=str, default=None,
                   help="record/compare golden masks: .npz path. When live "
                        "HF is unavailable, compares against this file; "
                        "with --record, writes it from the live HF run")
    p.add_argument("--record", action="store_true")
    p.add_argument("--skip_finetune", action="store_true")
    p.add_argument("--atol", type=float, default=2e-3,
                   help="probability-space tolerance for golden parity")
    args = p.parse_args(argv)

    from dilabhelmholtzoct_tpu.models.configs import config_for
    from dilabhelmholtzoct_tpu.models.convert import load_pretrained

    report = {"base_model": args.base_model, "checks": {}}
    ok = True

    cfg = config_for(args.base_model)
    if args.weights and os.path.isfile(args.weights):
        params = load_pretrained(args.weights, cfg)
        report["weights"] = args.weights
    else:
        # resolve via HF (directory snapshot or hub id — needs network or
        # a local HF cache)
        import transformers

        from dilabhelmholtzoct_tpu.models.convert import from_hf_model

        src = args.weights or args.base_model
        model = transformers.SamModel.from_pretrained(src)
        params = from_hf_model(model, cfg)
        report["weights"] = src
    report["checks"]["convert"] = {"pass": True}

    image = synthetic_oct_image()
    box, point = golden_prompts()
    ours = run_model(params, cfg, image, box, point)

    ref = hf_reference(args.weights, args.base_model, cfg, image, box, point)
    if ref is None and args.golden and os.path.exists(args.golden) \
            and not args.record:
        rec = np.load(args.golden)
        ref = {k: rec[k] for k in rec.files}
        report["golden_source"] = args.golden
    if ref is not None:
        for kind in ("box", "point"):
            max_abs = float(np.max(np.abs(
                ours[f"{kind}_probs"] - ref[f"{kind}_probs"])))
            iou = mask_iou(ours[f"{kind}_mask"], ref[f"{kind}_mask"])
            union = int(np.sum(
                (ours[f"{kind}_mask"] > 0) | (ref[f"{kind}_mask"] > 0)))
            # tiny masks: single borderline pixels (prob within atol of the
            # 0.5 threshold) dominate IoU — the prob-space atol is the
            # meaningful bound there
            passed = max_abs <= args.atol and (iou >= 0.99 or union < 50)
            ok &= passed
            report["checks"][f"golden_{kind}"] = {
                "pass": bool(passed), "max_abs_prob": max_abs,
                "mask_iou": iou,
            }
        if args.record and args.golden:
            np.savez_compressed(args.golden, **ref)
            report["golden_recorded"] = args.golden
    else:
        report["checks"]["golden"] = {
            "pass": None,
            "note": "no live HF model and no recorded goldens — goldens "
                    "skipped (convert+finetune still validate)",
        }

    if not args.skip_finetune:
        losses = finetune_check(params, cfg, args.base_model)
        decreased = losses[-1] < losses[0]
        ok &= decreased
        report["checks"]["finetune"] = {
            "pass": bool(decreased), "losses": losses,
        }

    report["pass"] = bool(ok)
    print(json.dumps(report, indent=1, default=float))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1, default=float)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
