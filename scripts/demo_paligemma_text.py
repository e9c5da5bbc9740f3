#!/usr/bin/env python3
"""Greedy PaliGemma text generation demo (the analogue of the reference's
``python src/model/vla/pizero.py --text_only`` smoke path, pizero.py:821-853,
as a proper CLI)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", type=str, default="random",
                   help="PaliGemma HF snapshot dir, or 'random' (tiny smoke).")
    p.add_argument("--image", type=str, default="")
    p.add_argument("--prompt", type=str, default="this image shows ")
    p.add_argument("--max-new-tokens", type=int, default=20)
    p.add_argument("--use-bf16", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="Single-program generation (prefill + decode scan).")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.paligemma.config import PaliGemmaConfig
    from blurr_tpu.models.paligemma.model import PaliGemmaForConditionalGeneration

    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32

    if Path(args.model_path).is_dir():
        from transformers import AutoTokenizer

        from blurr_tpu.models.paligemma.load import load_hf_model
        from blurr_tpu.models.paligemma.processing import PaliGemmaProcessor

        model, params = load_hf_model(args.model_path, dtype)
        tokenizer = AutoTokenizer.from_pretrained(args.model_path, padding_side="right")
        processor = PaliGemmaProcessor(
            tokenizer,
            model.config.vision_config.num_image_tokens,
            model.config.vision_config.image_size,
        )
        if args.image and Path(args.image).exists():
            image = Image.open(args.image).convert("RGB")
        else:
            image = Image.fromarray(
                np.random.RandomState(0).randint(0, 256, (224, 224, 3), np.uint8)
            )
        inputs = processor(text=[args.prompt], images=[image])
        eos = tokenizer.eos_token_id
    else:
        # random-init smoke: tiny dims, stub tokenizer
        config = PaliGemmaConfig(
            vision_config={
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "image_size": 28, "patch_size": 14,
            },
            text_config={
                "vocab_size": 300, "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "num_key_value_heads": 1, "head_dim": 16,
            },
            image_token_index=260,
            pad_token_id=0,
            projection_dim=32,
            hidden_size=32,
        )
        model = PaliGemmaForConditionalGeneration(config)
        params = model.init_params(jax.random.PRNGKey(0), dtype)
        rng = np.random.RandomState(0)
        n_img = config.vision_config.num_image_tokens
        ids = np.concatenate(
            [np.full((1, n_img), 260, np.int32), rng.randint(3, 299, (1, 6))], axis=1
        )
        inputs = {
            "input_ids": ids,
            "pixel_values": rng.rand(1, 3, 28, 28).astype(np.float32),
        }
        eos = None

    gen = model.generate_fused if args.fused else model.generate
    toks = gen(
        params,
        inputs["input_ids"],
        inputs["pixel_values"].astype(np.float32),
        max_new_tokens=args.max_new_tokens,
        eos_token_id=eos,
    )
    print("\n=========================")
    print("Prompt:", args.prompt)
    if Path(args.model_path).is_dir():
        print("Generated text:", tokenizer.decode(toks[0], skip_special_tokens=True))
    else:
        print("Generated token ids:", toks[0].tolist())
    print("=========================\n")


if __name__ == "__main__":
    main()
