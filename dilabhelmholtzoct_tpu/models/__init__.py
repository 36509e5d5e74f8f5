from .configs import (
    DecoderConfig,
    PromptConfig,
    SamConfig,
    VisionConfig,
    config_for,
    sam_tiny,
    sam_vit_base,
    sam_vit_huge,
    sam_vit_large,
)
from .sam import (
    decode_masks,
    encode_image,
    encode_prompts,
    image_wide_pe,
    init_params,
    sam_forward,
)

__all__ = [
    "DecoderConfig",
    "PromptConfig",
    "SamConfig",
    "VisionConfig",
    "config_for",
    "sam_tiny",
    "sam_vit_base",
    "sam_vit_huge",
    "sam_vit_large",
    "decode_masks",
    "encode_image",
    "encode_prompts",
    "image_wide_pe",
    "init_params",
    "sam_forward",
]
