"""MiniVLA-dims (SigLIP-so400m + Qwen2.5-0.5B arch) latency ladder on one
chip: bf16 vs w8a8 vs w4a8, one process (shapes share the compile cache)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.models.openvla.llama import (
    quantize_llama_w4a8,
    quantize_llama_w8a8,
)
from blurr_tpu.models.openvla.model import EMPTY_TOKEN, OpenVLA
from blurr_tpu.models.openvla.processing import OpenVLAProcessor
from blurr_tpu.utils.monitor import timed_call
from eval_prismatic_vla_simpler import minivla_spec


def main():
    spec = minivla_spec()
    model = OpenVLA(spec)
    params = model.init_params(jax.random.PRNGKey(0), jnp.bfloat16)

    processor = OpenVLAProcessor(None, image_size=spec.siglip.image_size,
                                 fused=False)
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (256, 256, 3), np.uint8)
    prompt = "In: What action should the robot take to pick up the carrot?\nOut:"
    inputs = processor(prompt, image)
    ids = jnp.asarray(inputs["input_ids"])
    ids = jnp.concatenate(
        [ids, jnp.full((1, 1), EMPTY_TOKEN, ids.dtype)], axis=1
    )
    px = jnp.asarray(inputs["pixel_values"], jnp.bfloat16)
    step = jax.jit(model.predict_action_tokens)

    ms, _, _ = timed_call(step, params, ids, px, iters=20)
    print(f"minivla bf16: {ms * 1e3:.2f} ms", flush=True)

    for name, qfn in (("w8a8", quantize_llama_w8a8), ("w4a8", quantize_llama_w4a8)):
        qp = dict(params)
        qp["llama"] = qfn(params["llama"])
        ms, _, _ = timed_call(step, qp, ids, px, iters=20)
        print(f"minivla {name}: {ms * 1e3:.2f} ms", flush=True)
        del qp


if __name__ == "__main__":
    main()
