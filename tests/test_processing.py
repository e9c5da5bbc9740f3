"""Processor surfaces: prompt format, padding, image normalization."""

import numpy as np

from blurr_tpu.models.openvla.processing import (
    OpenVLAProcessor,
    build_prompt,
    process_image,
)
from blurr_tpu.models.pi0.processing import (
    StubTokenizer,
    VLAProcessor,
    add_image_tokens_to_prompt,
    process_images,
)


def test_paligemma_prompt_format():
    """<image>*N + BOS + text + '\\n' (reference processing.py:9-22)."""
    out = add_image_tokens_to_prompt("pick the cup", "<bos>", 3, "<image>")
    assert out == "<image><image><image><bos>pick the cup\n"


def test_vla_processor_places_image_tokens_first():
    tok = StubTokenizer(image_token_id=50)
    proc = VLAProcessor(tok, num_image_tokens=4, max_seq_len=12)
    images = np.zeros((1, 3, 28, 28), np.uint8)
    out = proc(text=["pick up the cup"], images=images)
    ids = np.asarray(out["input_ids"])[0]
    assert (ids[:4] == 50).all()          # image tokens first
    assert ids[4] == tok.bos_token_id     # then BOS
    am = np.asarray(out["attention_mask"])[0]
    assert am.shape == (12,)
    assert am[: int(am.sum())].all() and not am[int(am.sum()):].any()  # right pad


def test_pi0_image_normalization():
    images = np.full((1, 3, 4, 4), 255, np.uint8)
    px = np.asarray(process_images(images))
    np.testing.assert_allclose(px, 1.0, atol=1e-6)  # (1 - .5)/.5
    px0 = np.asarray(process_images(np.zeros((1, 3, 4, 4), np.uint8)))
    np.testing.assert_allclose(px0, -1.0, atol=1e-6)


def test_openvla_prompt_and_dual_normalization():
    assert (
        build_prompt("Pick The Carrot")
        == "In: What action should the robot take to pick the carrot?\nOut:"
    )
    img = np.full((32, 32, 3), 255, np.uint8)
    out = process_image(img, image_size=28, fused=True)
    assert out.shape == (1, 6, 28, 28)
    # dino channels: (1 - imagenet_mean)/imagenet_std; siglip channels: 1.0
    np.testing.assert_allclose(out[0, 3:], 1.0, atol=1e-5)
    assert out[0, :3].mean() > 1.5  # imagenet norm pushes white above 1

    proc = OpenVLAProcessor(None, image_size=28, fused=True)
    batch = proc("In: test?\nOut:", img)
    assert batch["input_ids"][0, 0] == 1  # llama BOS
    assert batch["pixel_values"].shape == (1, 6, 28, 28)
