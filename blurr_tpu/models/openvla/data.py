"""Sharded-dataset plumbing for OpenVLA fine-tuning.

The generic streaming layer (mmap shards, O(1)-resumable shuffled loader,
background prefetch) lives in ``blurr_tpu.data``; this module fixes the
OpenVLA key convention on top of it and provides the host-side batch
assembly the trainer consumes (scripts/train_openvla_lora.py --data <dir>).

Key convention (written by :func:`write_openvla_dataset`):
- ``image``           [N, H, W, 3] uint8 camera frames
- ``instruction_ids`` [N, T] int32 pre-tokenized prompts (BOS ... trailing
                      EMPTY token, right-padded with 0)
- ``instruction_len`` [N] int32 valid prompt lengths
- ``action``          [N, action_dim] (AR token objective) or
                      [N, chunk_len, action_dim] (OFT L1) in [-1, 1]
- ``proprio``         [N, P] float32 (optional; OFT --use-proprio)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from blurr_tpu.models.openvla.processing import (
    process_image,
    tokenize_prompt_ids,
)


def write_openvla_dataset(
    out_dir,
    images: np.ndarray,
    instructions: Sequence[str],
    actions: np.ndarray,
    tokenizer=None,
    proprios: Optional[np.ndarray] = None,
    max_text_tokens: int = 32,
    shard_size: int = 1024,
) -> dict:
    """Tokenize + pack raw (image, instruction, action) triples into the
    sharded on-disk format. Each unique instruction tokenizes once."""
    from blurr_tpu.data import write_dataset
    from blurr_tpu.models.openvla.processing import StubLlamaTokenizer

    tokenizer = tokenizer or StubLlamaTokenizer()
    n = len(instructions)
    assert images.shape[0] == n and actions.shape[0] == n
    cache: Dict[str, list] = {}
    ids = np.zeros((n, max_text_tokens), np.int32)
    lens = np.zeros((n,), np.int32)
    for i, instr in enumerate(instructions):
        toks = cache.get(str(instr))
        if toks is None:
            toks = tokenize_prompt_ids(tokenizer, str(instr), max_text_tokens)
            cache[str(instr)] = toks
        ids[i, : len(toks)] = toks
        lens[i] = len(toks)
    arrays = {
        "image": np.ascontiguousarray(images, np.uint8),
        "instruction_ids": ids,
        "instruction_len": lens,
        "action": np.asarray(actions, np.float32),
    }
    if proprios is not None:
        arrays["proprio"] = np.asarray(proprios, np.float32)
    return write_dataset(out_dir, arrays, shard_size=shard_size)


class OpenVLATrainTransform:
    """Loader transform: raw dataset rows -> the trainer's device batch.

    AR (``oft=False``): appends each example's ground-truth action tokens
    right after its prompt (contiguous, pad at the end) and emits
    ``(ids, valid, pixels, labels)`` for ``OpenVLA.action_ce_loss``.
    OFT: emits ``(ids, valid, pixels, actions[, proprio])`` for
    ``oft_l1_loss`` — ragged prompts ride ``attn_valid``.
    """

    def __init__(self, model, image_size: int, fused: bool,
                 oft: bool = False, use_proprio: bool = False):
        self.model = model
        self.image_size = int(image_size)
        self.fused = bool(fused)
        self.oft = bool(oft)
        self.use_proprio = bool(use_proprio)

    def __call__(self, batch: Dict[str, np.ndarray]):
        ids = np.array(batch["instruction_ids"], np.int32)  # writable copy
        lens = np.asarray(batch["instruction_len"], np.int32)
        b, t = ids.shape
        px = np.concatenate(
            [
                process_image(img, self.image_size, self.fused)
                for img in np.asarray(batch["image"])
            ],
            axis=0,
        )
        valid = (np.arange(t)[None, :] < lens[:, None]).astype(np.int32)
        if self.oft:
            out = {
                "input_ids": ids,
                "attn_valid": valid,
                "pixel_values": px,
                "actions": np.asarray(batch["action"], np.float32),
            }
            if self.use_proprio:
                out["proprio"] = np.asarray(batch["proprio"], np.float32)
            return out
        action_dim = batch["action"].shape[-1]
        labels = self.model.tokenize_actions(batch["action"])
        full = np.zeros((b, t + action_dim), np.int32)
        full[:, :t] = ids
        for r in range(b):  # contiguous: action tokens start at each len
            full[r, lens[r] : lens[r] + action_dim] = labels[r]
        fvalid = (
            np.arange(t + action_dim)[None, :] < (lens + action_dim)[:, None]
        ).astype(np.int32)
        return {
            "input_ids": full,
            "attn_valid": fvalid,
            "pixel_values": px,
            "labels": labels,
        }
