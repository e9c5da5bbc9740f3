"""Scan-level A/B for the w8a8 prefill gap (v5e, batch 1, S=276).

The standalone per-matmul microbenches are dispatch-noise-dominated; this
measures the REAL 18-layer prefill scan in three variants:

  A. production w8a8 path (dynamic fp32 absmax quant per matmul input)
  B. fixed-scale quant (no absmax reduction: xq = round(x * c)) — isolates
     the absmax reduction + per-token scale broadcast cost
  C. no quant at all: activations bitcast-round-tripped as int8 garbage
     (wrong math, right shapes/dtypes) — isolates ALL activation-quant cost,
     leaving pure int8 dots + rescale + norms/rope/attention

A-B = absmax cost; B-C = round/clip/cast cost; C vs the ~2.9 ms floor =
irreducible non-matmul scan content + int8 MXU efficiency.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.config.core import load_yaml
from blurr_tpu.models.pi0 import joint as joint_lib
from blurr_tpu.models.pi0.joint import JointSpec
from blurr_tpu.ops import masks as mask_lib
from blurr_tpu.ops import quant as quant_lib
from blurr_tpu.ops.quant import quantize_mixture_w8a8
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import timed_call


from experiments.fastinit import iota_weights as mk


def main():
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    spec = JointSpec.from_config(dict(cfg["joint"]["config"]))
    shapes = jax.eval_shape(
        lambda: joint_lib.init_joint_params(jax.random.PRNGKey(0), spec, jnp.bfloat16)
    )
    jp = jax.tree.map(lambda l: mk(l.shape, l.dtype), shapes)
    jp["proprio"] = jp["action"]
    w = {
        "vlm": quantize_mixture_w8a8(jp["vlm"]),
        "proprio": quantize_mixture_w8a8(jp["proprio"]),
    }

    rng = np.random.RandomState(0)
    S = 276
    am = np.zeros((1, S), np.int32)
    am[:, :266] = 1
    am = jnp.asarray(am)
    em = jnp.asarray(rng.randn(1, S, 2048), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, 1, 1024), jnp.bfloat16)
    pm = mask_lib.pi0_prefix_mask(am, S, 1)
    vp, pp, _ = mask_lib.pi0_position_ids(1, S, 1, 4)

    def run_prefill(w, em, pe):
        return joint_lib.prefill(
            w, spec, {"vlm": em, "proprio": pe}, {"vlm": vp, "proprio": pp}, pm
        )

    def bench(name, fn, *args, iters=20):
        t, _, _ = timed_call(jax.jit(fn), *args, warmup=3, iters=iters)
        print(f"{name:<44s} {t*1e3:7.3f} ms", flush=True)
        return t * 1e3

    orig = quant_lib.w8a8_mm
    a = bench("A production w8a8 prefill", run_prefill, w, em, pe)

    def mm_fixed_scale(x, wd, activation_clip=None):
        dtype = x.dtype
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 100.0), -128, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wd["q8a"], (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * 0.01 * wd["s"]).astype(dtype)

    quant_lib.w8a8_mm = mm_fixed_scale
    b = bench("B fixed-scale quant (no absmax)", run_prefill, w, em, pe)

    def mm_noquant(x, wd, activation_clip=None):
        dtype = x.dtype
        # garbage math, right shapes: reinterpret bf16 bytes as int8
        xq = jax.lax.bitcast_convert_type(x, jnp.int8)[..., 0]
        acc = jax.lax.dot_general(
            xq, wd["q8a"], (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * 0.01 * wd["s"]).astype(dtype)

    quant_lib.w8a8_mm = mm_noquant
    c = bench("C bitcast 'quant' (pure int8 dots)", run_prefill, w, em, pe)
    quant_lib.w8a8_mm = orig

    print(f"\nabsmax cost (A-B): {a-b:.3f} ms; round/cast cost (B-C): {b-c:.3f} ms; "
          f"int8-dot scan floor proxy C: {c:.3f} ms (vs ~2.9 ms roofline)")


if __name__ == "__main__":
    main()
