"""Interactive OCT segmentation web app (Gradio).

UI parity with octsam/inference/app.py: an ImagePrompter input (click =
point prompt, drag = box prompt), AnnotatedImage output with mask red, box
green, point blue (app.py:54-60). The backend is the jitted TPU engine with
encoder caching (inference/engine.py) instead of a per-click torch forward.

Run:
    python -m dilabhelmholtzoct_tpu.inference.app \
        --base_model facebook/sam-vit-base \
        --checkpoint /path/to/finetuned.pt [--share]

Gradio is an optional dependency; without it this module still exposes
``segment_event`` for programmatic use.
"""

from __future__ import annotations

import argparse

import numpy as np

from .engine import SegmentationEngine, parse_image_prompter_points, point_marker


def segment_event(engine: SegmentationEngine, inputs: dict):
    """Handle one ImagePrompter event dict {'image', 'points'} →
    (image, [(mask_or_region, label), ...]) in the reference's
    AnnotatedImage format (app.py:33-52)."""
    if not inputs or inputs.get("image") is None:
        # Submit before an image is uploaded: ImagePrompter's empty value
        # is None — return an empty annotation instead of a raw TypeError
        # banner in the UI
        return None, []
    img = inputs["image"]
    masks = []
    for prompt_type, prompt in parse_image_prompter_points(
            inputs.get("points") or []):
        binary, _ = engine.segment(img, prompt, prompt_type,
                                   with_probs=False)
        if prompt_type == "points":
            masks.append(
                (point_marker(img.shape[:2], prompt[0], prompt[1]), "point")
            )
        else:
            masks.append((prompt, "box"))
        masks.append((binary[0], "mask"))
    return img, masks


def build_demo(engine: SegmentationEngine):
    import gradio as gr
    from gradio_image_prompter import ImagePrompter

    return gr.Interface(
        lambda inputs: segment_event(engine, inputs),
        ImagePrompter(show_label=True),
        [gr.AnnotatedImage(
            color_map={"mask": "#ff0000", "box": "#00ff00", "point": "#0000ff"}
        )],
    )


def main(argv=None, *, allow_pickled_module_default: bool = False):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_model", type=str,
                        default="facebook/sam-vit-base")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="fine-tuned .pt/.pth/.safetensors (local)")
    parser.add_argument("--share", action="store_true",
                        help="public tunnel (the reference always shares, "
                             "app.py:62; here opt-in)")
    parser.add_argument("--allow_pickled_module", action="store_true",
                        default=allow_pickled_module_default,
                        help="accept whole-pickled-module .pth checkpoints "
                             "(reference app_organoid.py:12-13); pickles "
                             "can execute code, so opt-in")
    args = parser.parse_args(argv)

    engine = SegmentationEngine.from_checkpoint(
        args.base_model, args.checkpoint,
        allow_pickled_module=args.allow_pickled_module,
    )
    try:
        demo = build_demo(engine)
    except ImportError as e:
        raise SystemExit(
            f"gradio/gradio_image_prompter not installed ({e}); the engine "
            "is importable as dilabhelmholtzoct_tpu.inference.engine"
        )
    demo.launch(share=args.share)


if __name__ == "__main__":
    main()
