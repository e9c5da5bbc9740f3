"""OpenVLA input processing (prompt + dual-normalized image stack).

The HF AutoProcessor the reference uses builds a llama-tokenized prompt
"In: What action should the robot take to {instruction}?\nOut:" and one
image tensor per backbone (DINOv2 uses ImageNet normalization, SigLIP uses
0.5/0.5). Here the two normalized images are stacked into a 6-channel tensor
consumed by the fused backbone.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
SIGLIP_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
SIGLIP_STD = np.array([0.5, 0.5, 0.5], np.float32)


EMPTY_TOKEN = 29871  # llama "\u2581" — remote code appends it before decoding


def tokenize_prompt_ids(tokenizer, instruction: str,
                        max_text_tokens: int = 0) -> list:
    """BOS ... prompt ... trailing EMPTY token ids — the ONE prompt
    convention shared by the AR decode, OFT, the serving _prepare, the
    trainer, and write_openvla_dataset. ``max_text_tokens`` > 0 enforces a
    length budget (raises ValueError)."""
    out = tokenizer(build_prompt(str(instruction)), return_tensors="np")
    ids = np.asarray(out["input_ids"])[0].tolist()
    if ids[-1] != EMPTY_TOKEN:
        ids.append(EMPTY_TOKEN)
    if max_text_tokens and len(ids) > max_text_tokens:
        raise ValueError(
            f"instruction {instruction!r} tokenizes to {len(ids)} tokens "
            f"> max_text_tokens={max_text_tokens}"
        )
    return ids


def build_prompt(instruction: str) -> str:
    return f"In: What action should the robot take to {instruction.lower()}?\nOut:"


def process_image(image: np.ndarray, image_size: int = 224, fused: bool = True) -> np.ndarray:
    """uint8 HxWx3 -> float [1, 6 (or 3), S, S]: resized then normalized per
    backbone (DINOv2 channels first, SigLIP channels second)."""
    from blurr_tpu.utils.image import lanczos_resize_uint8

    resized = lanczos_resize_uint8(
        np.ascontiguousarray(image, np.uint8), image_size, image_size
    )
    x = resized.astype(np.float32) / 255.0
    dino = (x - IMAGENET_MEAN) / IMAGENET_STD
    sig = (x - SIGLIP_MEAN) / SIGLIP_STD
    if fused:
        stacked = np.concatenate([dino, sig], axis=-1)  # [S, S, 6]
    else:
        stacked = sig
    return stacked.transpose(2, 0, 1)[None]


class StubLlamaTokenizer:
    """Llama-shaped tokenizer stub (BOS=1, hashing words into the vocab)."""

    def __init__(self, vocab_size: int = 32000):
        self.vocab_size = vocab_size
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 32000

    def __call__(self, text: str, return_tensors: Optional[str] = None):
        ids = [self.bos_token_id] + [
            abs(hash(w)) % (self.vocab_size - 3000) + 3 for w in text.split()
        ]
        arr = np.array([ids], np.int32)
        return {"input_ids": arr, "attention_mask": np.ones_like(arr)}


class OpenVLAProcessor:
    def __init__(self, tokenizer=None, image_size: int = 224, fused: bool = True):
        self.tokenizer = tokenizer or StubLlamaTokenizer()
        self.image_size = image_size
        self.fused = fused

    def __call__(self, prompt: str, image: np.ndarray) -> dict:
        tok = self.tokenizer(prompt, return_tensors="np")
        ids = np.asarray(tok["input_ids"], np.int32)
        return {
            "input_ids": ids,
            "attention_mask": np.ones_like(ids),
            "pixel_values": process_image(
                np.asarray(image), self.image_size, self.fused
            ),
        }


def load_hf_tokenizer(model_id_or_path: str):
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(model_id_or_path, trust_remote_code=True)
    except Exception:
        return None
