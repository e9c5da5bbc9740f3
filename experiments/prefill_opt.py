"""Prefill optimization candidates at the production shape (v5e, S=277).

The stage budget (stage_budget_v5e.md) shows prefill at 8.25 ms vs a 5.6 ms
weight floor / ~5.7 ms compute floor — the one stage with real headroom.
Candidates measured here, all semantics-preserving:

1. baseline two-mixture prefill (scan over all 18 layers)
2. cond-skip: the LAST layer's attention+MLP are discarded by the caller
   (reference final_layer_post_attn_skip semantics) — skip them with
   lax.cond inside the scan body (K/V still computed for the cache)
3. vlm-only scan + proprio mini-scan: vlm rows never attend proprio
   (block mask), so the vlm stream can run alone (big clean matmuls, no
   S=1 stalls in the pipeline), then proprio runs as an 18-layer S=1
   decode-style scan over the cached vlm K/V. Mathematically identical.
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
from blurr_tpu.models.pi0.joint import JointSpec
from blurr_tpu.ops import masks as mask_lib
from blurr_tpu.ops.attention import merge_heads, grouped_attention
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import timed_call


def main():
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    spec = JointSpec.from_config(dict(cfg["joint"]["config"]))

    from experiments.fastinit import iota_weights as mk

    shapes = jax.eval_shape(
        lambda: joint_lib.init_joint_params(jax.random.PRNGKey(0), spec, jnp.bfloat16)
    )
    jp = jax.tree.map(lambda l: mk(l.shape, l.dtype), shapes)
    jp["proprio"] = jp["action"]
    w = {"vlm": jp["vlm"], "proprio": jp["proprio"]}

    rng = np.random.RandomState(0)
    S = 276
    am = np.zeros((1, S), np.int32)
    am[:, :266] = 1
    am = jnp.asarray(am)
    em = jnp.asarray(rng.randn(1, S, 2048), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, 1, 1024), jnp.bfloat16)
    pm = mask_lib.pi0_prefix_mask(am, S, 1)
    vp, pp, _ = mask_lib.pi0_position_ids(1, S, 1, 4)

    def bench(name, fn, *args, iters=20):
        t0 = time.time()
        jitted = jax.jit(fn)  # ONE program: timed and evaluated below
        t, _, _ = timed_call(jitted, *args, warmup=3, iters=iters)
        print(f"{name:<46s} {t*1e3:7.3f} ms   [{time.time()-t0:.0f}s]", flush=True)
        return t * 1e3, jitted(*args)

    # 1) baseline
    base_ms, (k0, v0) = bench(
        "baseline two-mixture prefill",
        lambda w, em, pe: joint_lib.prefill(
            w, spec, {"vlm": em, "proprio": pe}, {"vlm": vp, "proprio": pp}, pm
        ),
        w, em, pe,
    )

    # 2) cond-skip last layer attention+MLP (manual variant of prefill)
    eps = spec.rms_norm_eps
    names = ["vlm", "proprio"]
    svs = [S, 1]
    nl = spec.num_hidden_layers

    def prefill_condskip(w, em, pe):
        hs = {"vlm": joint_lib.scale_embeds(em), "proprio": joint_lib.scale_embeds(pe)}
        ropes = {
            n: joint_lib.mixture_rope(spec.mixtures[n], spec, p)
            for n, p in (("vlm", vp), ("proprio", pp))
        }
        stacked = {
            n: {k: v for k, v in w[n].items() if k != "final_norm"} for n in names
        }
        idx = jnp.arange(nl)

        def layer(carry, xs):
            i, lps = xs
            hs = dict(zip(names, carry))
            qs, ks, vs = [], [], []
            for n in names:
                m = spec.mixtures[n]
                x = joint_lib._apply_norm(lps[n]["input_norm"], hs[n], None, m, eps)
                q, k, v = joint_lib._qkv(lps[n], x, *ropes[n], spec, m)
                qs.append(q); ks.append(k); vs.append(v)
            k = jnp.concatenate(ks, axis=2)
            v = jnp.concatenate(vs, axis=2)

            def full_branch(args):
                hs_t, q, k, v = args
                attn = grouped_attention(q, k, v, pm, spec.softclamp)
                attn = merge_heads(attn)
                outs = []
                off = 0
                for n, s in zip(names, svs):
                    m = spec.mixtures[n]
                    a = attn[:, off : off + s] @ lps[n]["o_w"]
                    off += s
                    h = hs_t[names.index(n)] + a
                    x = joint_lib._apply_norm(lps[n]["post_norm"], h, None, m, eps)
                    h = h + joint_lib._mlp(lps[n], x, spec, m)
                    outs.append(h)
                return tuple(outs)

            def skip_branch(args):
                hs_t, q, k, v = args
                return hs_t

            q = jnp.concatenate(qs, axis=2)
            new_hs = jax.lax.cond(
                i < nl - 1, full_branch, skip_branch, (carry, q, k, v)
            )
            return new_hs, (k, v)

        carry = tuple(hs[n] for n in names)
        _, (k_all, v_all) = jax.lax.scan(layer, carry, (idx, stacked))
        return k_all, v_all

    skip_ms, (k1, v1) = bench("cond-skip last layer", prefill_condskip, w, em, pe)
    print("  cache allclose:", bool(jnp.allclose(k0.astype(jnp.float32), k1.astype(jnp.float32))),
          flush=True)

    # 3) vlm-only scan + proprio mini-scan over cached vlm K/V
    def prefill_split(w, em, pe):
        # vlm stream alone (vlm rows attend only valid vlm cols)
        vlm_mask = pm[:, :S, :S]
        k_v, v_v = joint_lib.prefill(
            {"vlm": w["vlm"]}, spec, {"vlm": em}, {"vlm": vp}, vlm_mask
        )
        # proprio: S=1 stream per layer over [vlm K/V (cached) + own kv]
        m = spec.mixtures["proprio"]
        cos, sin = joint_lib.mixture_rope(m, spec, pp)
        pmask = pm[:, S:, :]  # [1, 1, S+1] proprio row of the prefix mask
        stacked = {k: v for k, v in w["proprio"].items() if k != "final_norm"}

        def layer(h, xs):
            lp, kc, vc = xs
            x = joint_lib._apply_norm(lp["input_norm"], h, None, m, eps)
            q, k, v = joint_lib._qkv(lp, x, cos, sin, spec, m)
            k_full = jnp.concatenate([kc, k], axis=2)
            v_full = jnp.concatenate([vc, v], axis=2)
            attn = grouped_attention(q, k_full, v_full, pmask, spec.softclamp)
            h = h + merge_heads(attn) @ lp["o_w"]
            x = joint_lib._apply_norm(lp["post_norm"], h, None, m, eps)
            h = h + joint_lib._mlp(lp, x, spec, m)
            return h, (k, v)

        h = joint_lib.scale_embeds(pe)
        _, (k_p, v_p) = jax.lax.scan(layer, h, (stacked, k_v, v_v))
        return (
            jnp.concatenate([k_v, k_p], axis=3),
            jnp.concatenate([v_v, v_p], axis=3),
        )

    split_ms, (k2, v2) = bench("split vlm-scan + proprio mini-scan", prefill_split, w, em, pe)
    d = jnp.max(jnp.abs(k0.astype(jnp.float32) - k2.astype(jnp.float32)))
    print("  cache max dev vs baseline:", float(d), flush=True)

    # 4) combined: split + cond-skip on the vlm scan's last layer
    print(f"\nbaseline {base_ms:.2f}  cond-skip {skip_ms:.2f}  split {split_ms:.2f}")


if __name__ == "__main__":
    main()
