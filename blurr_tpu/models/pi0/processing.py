"""VLA input processor (parity surface: reference src/model/vla/processing.py).

Tokenization stays on the host (episode-constant); image rescale/normalize is
a pure-jnp function so it fuses into the jitted encoder graph instead of
running on CPU every control step.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax.numpy as jnp

IMAGENET_STANDARD_MEAN = 0.5
IMAGENET_STANDARD_STD = 0.5


def add_image_tokens_to_prompt(
    prefix_prompt: str, bos_token: str, image_seq_len: int, image_token: str
) -> str:
    """PaliGemma prompt format: <image>*N + BOS + text + '\\n'
    (reference processing.py:9-22)."""
    return f"{image_token * image_seq_len}{bos_token}{prefix_prompt}\n"


def process_images(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, 3, H, W] -> normalized float: x/255 rescale then
    (x - 0.5) / 0.5, i.e. x/127.5 - 1. Runs in-graph."""
    x = jnp.asarray(images).astype(jnp.float32)
    return (x / 255.0 - IMAGENET_STANDARD_MEAN) / IMAGENET_STANDARD_STD



def setup_paligemma_tokenizer(tokenizer, image_token: str = "<image>") -> int:
    """Apply the PaliGemma tokenizer-mutation protocol (add <image> special
    token, 1024 <loc>/128 <seg> extended-vocab tokens, disable auto BOS/EOS
    — reference processing.py:80-93). Returns the <image> token id. Shared
    by VLAProcessor and PaliGemmaProcessor so the two cannot drift."""
    tokenizer.add_special_tokens({"additional_special_tokens": [image_token]})
    extra = [f"<loc{i:04d}>" for i in range(1024)]
    extra += [f"<seg{i:03d}>" for i in range(128)]
    tokenizer.add_tokens(extra)
    tokenizer.add_bos_token = False
    tokenizer.add_eos_token = False
    return tokenizer.convert_tokens_to_ids(image_token)


class VLAProcessor:
    """Prompt/image processor for PaliGemma-format VLAs.

    Adds the <image> special token plus <loc####>/<seg###> extra tokens to the
    tokenizer, pads to ``max_seq_len``, and prepends ``num_image_tokens``
    image tokens — the image tokens are ALWAYS the first positions, which the
    model's embed-merge relies on.
    """

    IMAGE_TOKEN = "<image>"

    def __init__(
        self,
        tokenizer,
        num_image_tokens: int,
        max_seq_len: int,
        tokenizer_padding: str = "max_length",
    ):
        self.image_seq_length = num_image_tokens
        self.max_seq_len = max_seq_len
        self.tokenizer_padding = tokenizer_padding

        self.image_token_id = setup_paligemma_tokenizer(
            tokenizer, self.IMAGE_TOKEN
        )
        self.tokenizer = tokenizer

    def tokenize(self, text: List[str], truncation: bool = True) -> dict:
        """Text-only half of __call__: image-token-prefixed prompt ->
        padded (input_ids, attention_mask). The serving instruction cache
        uses this directly so a cache miss never pays the image pipeline."""
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
            input_strings,
            return_tensors="np",
            max_length=self.max_seq_len,
            padding=self.tokenizer_padding,
            truncation=truncation,
        )
        return {
            "input_ids": jnp.asarray(inputs["input_ids"], jnp.int32),
            "attention_mask": jnp.asarray(inputs["attention_mask"], jnp.int32),
        }

    def __call__(
        self,
        text: List[str],
        images,  # uint8 array-like [B, 3, H, W]
        truncation: bool = True,
    ) -> dict:
        images = np.asarray(images)
        assert len(images) == len(
            text
        ), f"Received {len(images)} images for {len(text)} prompts."
        assert images.dtype == np.uint8, f"Expected uint8 images, got {images.dtype}."

        pixel_values = process_images(images)
        out = self.tokenize(text, truncation=truncation)
        return {
            "pixel_values": pixel_values,
            "input_ids": out["input_ids"],
            "attention_mask": out["attention_mask"],
        }


class StubTokenizer:
    """Dependency-free tokenizer for tests/benchmarks without the real
    PaliGemma vocabulary: hashes words into a small id range, honours the
    special-token API surface VLAProcessor uses."""

    def __init__(self, vocab_size: int = 1000, image_token_id: int = 257152):
        self.vocab_size = vocab_size
        self._image_token_id = image_token_id
        self.bos_token = "<bos>"
        self.bos_token_id = 2
        self.eos_token_id = 1
        self.pad_token_id = 0
        self.add_bos_token = True
        self.add_eos_token = False

    def add_special_tokens(self, d):
        pass

    def add_tokens(self, toks):
        pass

    def convert_tokens_to_ids(self, tok):
        if tok == "<image>":
            return self._image_token_id
        return abs(hash(tok)) % (self.vocab_size - 3) + 3

    def __call__(
        self, texts: Sequence[str], return_tensors="np", max_length=None,
        padding="max_length", truncation=True,
    ):
        img_tok = "<image>"
        rows, masks = [], []
        for t in texts:
            n_img = 0
            while t.startswith(img_tok):
                n_img += 1
                t = t[len(img_tok):]
            ids = [self._image_token_id] * n_img
            if t.startswith(self.bos_token):
                t = t[len(self.bos_token):]
                ids.append(self.bos_token_id)
            ids += [
                abs(hash(w)) % (self.vocab_size - 3) + 3 for w in t.split()
            ]
            ids.append(abs(hash("\n")) % (self.vocab_size - 3) + 3)
            if truncation and max_length:
                ids = ids[:max_length]
            mask = [1] * len(ids)
            if padding == "max_length" and max_length:
                pad = max_length - len(ids)
                ids += [self.pad_token_id] * pad
                mask += [0] * pad
            rows.append(ids)
            masks.append(mask)
        out = {
            "input_ids": np.array(rows, np.int32),
            "attention_mask": np.array(masks, np.int32),
        }
        if return_tensors == "pt":  # the reference VLAProcessor asks for
            # torch tensors (reference src/model/vla/processing.py:130);
            # honoring it lets the differential agent-loop tests drive the
            # reference stack with this stub
            import torch

            out = {k: torch.tensor(v, dtype=torch.long) for k, v in out.items()}
        return out
