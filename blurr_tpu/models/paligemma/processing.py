"""PIL-based PaliGemma processor (parity surface: reference
src/model/paligemma/processing.py — the text-demo variant using PIL bicubic
resize instead of the VLA adapter path)."""

from __future__ import annotations

from typing import List

import numpy as np
from PIL import Image

from blurr_tpu.models.pi0.processing import add_image_tokens_to_prompt

IMAGENET_STANDARD_MEAN = [0.5, 0.5, 0.5]
IMAGENET_STANDARD_STD = [0.5, 0.5, 0.5]


def resize(image: Image.Image, size, resample=Image.Resampling.BICUBIC):
    return image.resize((size[1], size[0]), resample=resample)


def rescale(image: np.ndarray, scale: float) -> np.ndarray:
    return (image * scale).astype(np.float32)


def normalize(image: np.ndarray, mean, std) -> np.ndarray:
    mean = np.array(mean, dtype=image.dtype)
    std = np.array(std, dtype=image.dtype)
    return (image - mean) / std


def process_images(
    images: List[Image.Image],
    size,
    resample=Image.Resampling.BICUBIC,
    rescale_factor: float = 1 / 255.0,
    image_mean=IMAGENET_STANDARD_MEAN,
    image_std=IMAGENET_STANDARD_STD,
) -> List[np.ndarray]:
    out = []
    for image in images:
        image = resize(image, size, resample)
        arr = np.array(image)
        arr = rescale(arr, rescale_factor)
        arr = normalize(arr, image_mean, image_std)
        out.append(arr.transpose(2, 0, 1))  # [C, H, W]
    return out


class PaliGemmaProcessor:
    IMAGE_TOKEN = "<image>"

    def __init__(self, tokenizer, num_image_tokens: int, image_size: int):
        self.image_seq_length = num_image_tokens
        self.image_size = image_size
        from blurr_tpu.models.pi0.processing import setup_paligemma_tokenizer

        self.image_token_id = setup_paligemma_tokenizer(
            tokenizer, self.IMAGE_TOKEN
        )
        self.tokenizer = tokenizer

    def __call__(
        self, text: List[str], images: List[Image.Image],
        padding: str = "longest", truncation: bool = True,
    ) -> dict:
        assert len(images) == len(text) == 1, "batch size 1 for the text demo"
        pixel_values = np.stack(
            process_images(images, (self.image_size, self.image_size)), axis=0
        )
        input_strings = [
            add_image_tokens_to_prompt(
                prefix_prompt=prompt,
                bos_token=self.tokenizer.bos_token,
                image_seq_len=self.image_seq_length,
                image_token=self.IMAGE_TOKEN,
            )
            for prompt in text
        ]
        inputs = self.tokenizer(
            input_strings, return_tensors="np", padding=padding, truncation=truncation
        )
        return {
            "pixel_values": pixel_values,
            "input_ids": np.asarray(inputs["input_ids"], np.int32),
            "attention_mask": np.asarray(inputs["attention_mask"], np.int32),
        }
