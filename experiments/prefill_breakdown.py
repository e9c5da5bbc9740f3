"""Why is two-mixture prefill slower than vlm-only? Breakdown experiment."""

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
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import timed_call
from experiments.fastinit import fake_params


def main():
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    spec = JointSpec.from_config(dict(cfg["joint"]["config"]))

    def mk(leaf_shape, dtype=jnp.bfloat16, scale=0.02):
        n = int(np.prod(leaf_shape))
        flat = (jnp.arange(n, dtype=jnp.float32) % 101 - 50) * (scale / 50)
        return flat.reshape(leaf_shape).astype(dtype)

    shapes = jax.eval_shape(
        lambda: joint_lib.init_joint_params(jax.random.PRNGKey(0), spec, jnp.bfloat16)
    )
    jp = jax.tree.map(lambda l: mk(l.shape, l.dtype), shapes)
    jp["proprio"] = jp["action"]

    rng = np.random.RandomState(0)
    am = np.zeros((1, 276), np.int32)
    am[:, :266] = 1
    am = jnp.asarray(am)
    em = jnp.asarray(rng.randn(1, 276, 2048), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, 1, 1024), jnp.bfloat16)
    pm = mask_lib.pi0_prefix_mask(am, 276, 1)
    vp, pp, ap = mask_lib.pi0_position_ids(1, 276, 1, 4)

    f = jax.jit(
        lambda jp, em, pe: joint_lib.prefill(
            {"vlm": jp["vlm"], "proprio": jp["proprio"]},
            spec,
            {"vlm": em, "proprio": pe},
            {"vlm": vp, "proprio": pp},
            pm,
        )
    )
    t, _, _ = timed_call(f, jp, em, pe, warmup=2, iters=10)
    print("two-mixture prefill:", round(t * 1000, 2), "ms", flush=True)

    f2 = jax.jit(
        lambda jp, em: joint_lib.prefill(
            {"vlm": jp["vlm"]}, spec, {"vlm": em}, {"vlm": vp}, pm[:, :276, :276]
        )
    )
    t, _, _ = timed_call(f2, jp, em, warmup=2, iters=10)
    print("vlm-only prefill:", round(t * 1000, 2), "ms", flush=True)

    # proprio-as-277th-token variant: pad proprio embedding into the vlm
    # stream? Not semantically valid (different weights) -- instead measure a
    # two-mixture variant where proprio uses the SAME hidden size as vlm to
    # see if the small-matmul stream is the cost.
    t, _, _ = timed_call(f, jp, em, pe, warmup=0, iters=10)
    print("two-mixture again:", round(t * 1000, 2), "ms", flush=True)


if __name__ == "__main__":
    main()
