"""Stage budget for the W8A8 preset (v5e, batch 1): is the quantized prefill
near ITS floors?

Int8 weights halve the weight-read bytes and the int8 MXU doubles the
matmul rate, so the prefill floors drop to ~2.8 ms (weights) / ~2.9 ms
(compute). If the measured w8a8 prefill sits far above both, the dynamic
activation-quant (absmax + round in XLA between matmuls) is the suspect and
a fused Pallas quantize-matmul would be the next kernel to write.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.config.core import load_yaml
from blurr_tpu.models.pi0 import joint as joint_lib
from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.ops import masks as mask_lib
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import timed_call
from experiments.fastinit import fake_params, tree_bytes

HBM_GBPS = 819.0


def main():
    cfg = load_yaml(config_root() / "eval" / "bridge_w8a8_steps1.yaml")
    cfg["use_bf16"] = True
    model = PiZero(cfg)
    params = fake_params(model, jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)

    rng = np.random.RandomState(0)
    bsz, seq = 1, cfg["max_image_text_tokens"]
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    ids = np.zeros((bsz, seq), np.int32)
    am = np.zeros((bsz, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img : n_img + 10] = rng.randint(3, 1000, (bsz, 10))
    am[:, : n_img + 10] = 1
    img = cfg["vision"]["config"]["image_size"]
    ids, am = jnp.asarray(ids), jnp.asarray(am)
    px = jnp.asarray(rng.rand(bsz, 3, img, img) * 2 - 1, jnp.bfloat16)
    pr = jnp.asarray(rng.randn(bsz, 1, cfg["proprio_dim"]), jnp.bfloat16)
    noise = jnp.asarray(
        rng.randn(bsz, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16
    )

    def bench(name, fn, *args, nbytes=0, iters=20):
        t0 = time.time()
        t, _, _ = timed_call(jax.jit(fn), *args, warmup=3, iters=iters)
        ms = t * 1e3
        floor = nbytes / (HBM_GBPS * 1e9) * 1e3 if nbytes else 0
        print(
            f"{name:<42s} {ms:7.3f} ms"
            + (f"  (weight floor {floor:.2f} ms)" if nbytes else "")
            + f"   [{time.time()-t0:.0f}s]",
            flush=True,
        )
        return ms

    bench("w8a8 full control step", model.infer_action,
          params, ids, am, px, pr, noise, nbytes=tree_bytes(params))

    spec = model.joint_spec
    pm = mask_lib.pi0_prefix_mask(am, seq, 1)
    vp, pp, _ = mask_lib.pi0_position_ids(bsz, seq, 1, 4)
    em = jnp.asarray(rng.randn(bsz, seq, 2048), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(bsz, 1, 1024), jnp.bfloat16)
    w = {"vlm": params["joint"]["vlm"], "proprio": params["joint"]["proprio"]}
    bench(
        "w8a8 prefill (18L, S=277)",
        lambda w, em, pe: joint_lib.prefill(
            w, spec, {"vlm": em, "proprio": pe}, {"vlm": vp, "proprio": pp}, pm
        ),
        w, em, pe,
        nbytes=tree_bytes(w),
    )

    cache = jax.jit(
        lambda w, em, pe: joint_lib.prefill(
            w, spec, {"vlm": em, "proprio": pe}, {"vlm": vp, "proprio": pp}, pm
        )
    )(w, em, pe)
    amask = mask_lib.pi0_action_mask(am, seq, 1, 4)
    ae = jnp.asarray(rng.randn(bsz, 4, 1024), jnp.bfloat16)
    _, _, ap = mask_lib.pi0_position_ids(bsz, seq, 1, 4)
    aw = {"action": params["joint"]["action"]}
    bench(
        "w8a8 decode (1 flow step)",
        lambda w, ae, cache: joint_lib.decode(w, spec, ae, ap, cache, amask),
        aw, ae, cache,
        nbytes=tree_bytes(aw),
    )


if __name__ == "__main__":
    main()
