"""Differential numerical parity against the reference's OWN torch modules.

Unlike tests/test_numpy_oracle.py (an independently written oracle), these
tests import the reference's vendored torch code from
/root/reference/third_party/open_pi_zero and assert fp32 allclose between its
outputs and blurr_tpu's, with identical random weights bridged both ways:

- build_causal_mask_and_position_ids + split_full_mask_into_submasks
  (reference src/model/vla/pizero.py:328-393) vs ops/masks.py
- forward_mixture_layers under all three cache modes
  (reference src/model/vla/joint_model.py:24-310) vs
  joint.prefill/decode/naive_forward/single_forward — incl. adaLN/adaLN-Zero
- GemmaRMSNorm / RoPE / GemmaMLP micro-parity (reference
  src/model/paligemma/modules.py:7-95)
- SigLIP tower + projector (reference src/model/paligemma/siglip.py)
- int8 KV quantize/dequant (reference src/model/kv_cache.py:90-106)
- int8 weight quant (reference src/model/quantization/int8_linear.py)
- VLAProcessor prompt/padding/image-normalize (reference
  src/model/vla/processing.py:96-136)
- geometry vs reference src/utils/geometry.py
- aux modules: SinusoidalPosEmb / ActionEncoder / AdaptiveRMSNorm /
  AdaptiveLayerscale / GaussianFourier (reference src/model/vla/modules.py)

Skips cleanly when the reference tree is absent.
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.utils.reference_bridge import (
    DotDict,
    reference_available,
)

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from blurr_tpu.utils.reference_bridge import (  # noqa: E402
    bridge_joint,
    bridge_siglip,
    load_reference,
    t2n,
)

ref = load_reference()
torch = ref.torch
torch.set_grad_enabled(False)


@pytest.fixture(autouse=True)
def _seed_torch_global():
    """Several tests draw inputs (and GaussianFourier's projection) from the
    GLOBAL torch RNG; pin it per-test so results are order-independent (the
    tight fp32 tolerances can trip on unlucky large draws otherwise)."""
    torch.manual_seed(0)

from blurr_tpu.models.pi0 import joint as joint_lib  # noqa: E402
from blurr_tpu.models.pi0.joint import JointSpec, MixtureSpec  # noqa: E402
from blurr_tpu.models.pi0.siglip import (  # noqa: E402
    projector_forward,
    siglip_forward,
)
from blurr_tpu.ops import masks as mask_lib  # noqa: E402


def A(t):
    """torch tensor -> jnp array (fp32)."""
    return jnp.asarray(t2n(t))


def close(a, b, atol=3e-5, rtol=3e-5):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


def randomize_(module, seed=0, scale=0.1):
    """Replace every parameter with small random values so norm scales,
    biases, and adaptive weights are all nonzero (a zero Gemma scale would
    hide a (1+w) convention bug)."""
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        p.data = torch.randn(p.shape, generator=g) * scale


# ---------------------------------------------------------------------------
# Tiny joint-model configuration (bridge.yaml schema, shrunk dims)
# ---------------------------------------------------------------------------

M_IMG_TEXT, N_PROPRIO, N_ACTION = 6, 2, 3
B = 2


def joint_cfg(adaptive_mode=None):
    mix = lambda h, inter, final, cache: dict(  # noqa: E731
        hidden_size=h,
        intermediate_size=inter,
        use_final_norm=final,
        cache=cache,
        adaptive_mode=None,
        rope_theta=10000.0,
        use_quantize=False,
        use_lora=False,
    )
    cfg = dict(
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        rms_norm_eps=1e-6,
        attention_bias=False,
        attention_dropout=0.0,
        rope_theta=10000.0,
        time_hidden_size=12,
        use_quantize=False,
        use_lora=False,
        pad_token_id=0,
        mixture=dict(
            vlm=mix(32, 64, False, True),
            proprio=mix(16, 48, True, True),
            action=mix(16, 48, True, False),
        ),
    )
    if adaptive_mode:
        cfg["mixture"]["proprio"]["adaptive_mode"] = adaptive_mode
        cfg["mixture"]["action"]["adaptive_mode"] = adaptive_mode
    return cfg


def build_models(adaptive_mode=None, seed=0):
    """(reference JointModel, blurr params pytree, blurr JointSpec)."""
    cfg = joint_cfg(adaptive_mode)
    jm = ref.joint_model.JointModel(DotDict(cfg)).eval()
    randomize_(jm, seed=seed)
    params = jax.tree.map(jnp.asarray, bridge_joint(jm))
    mixtures = {
        name: MixtureSpec(
            hidden_size=m["hidden_size"],
            intermediate_size=m["intermediate_size"],
            rope_theta=m["rope_theta"],
            use_final_norm=m["use_final_norm"],
            cache=m["cache"],
            adaptive_mode=m["adaptive_mode"],
        )
        for name, m in cfg["mixture"].items()
    }
    spec = JointSpec(
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg["num_key_value_heads"],
        head_dim=cfg["head_dim"],
        rms_norm_eps=cfg["rms_norm_eps"],
        time_hidden_size=cfg["time_hidden_size"],
        mixtures=mixtures,
    )
    return jm, params, spec


def ref_masks(attn_mask_np):
    """Drive the reference's actual mask builder (pizero.py:328-393), bound
    onto a stub so no full PiZero construction is needed."""
    stub = types.SimpleNamespace(
        max_image_text_tokens=M_IMG_TEXT,
        num_proprio_tokens=N_PROPRIO,
        num_action_tokens=N_ACTION,
        total_num_tokens=M_IMG_TEXT + N_PROPRIO + N_ACTION,
    )
    am = torch.tensor(attn_mask_np)
    full, vlm_pos, prop_pos, act_pos = (
        ref.pizero.PiZero.build_causal_mask_and_position_ids(
            stub, am, torch.float32
        )
    )
    prefix, action = ref.pizero.PiZero.split_full_mask_into_submasks(stub, full)
    return full, prefix, action, vlm_pos, prop_pos, act_pos


ATTN_MASK = np.array(
    [[1] * 6, [1] * 4 + [0] * 2], dtype=np.int64
)  # one full row, one padded row


def embeds_for(cfg_mix, seed=1):
    g = torch.Generator().manual_seed(seed)
    return {
        "vlm": torch.randn(B, M_IMG_TEXT, cfg_mix["vlm"]["hidden_size"], generator=g),
        "proprio": torch.randn(
            B, N_PROPRIO, cfg_mix["proprio"]["hidden_size"], generator=g
        ),
        "action": torch.randn(
            B, N_ACTION, cfg_mix["action"]["hidden_size"], generator=g
        ),
    }


def position_ids_jnp(vlm_pos, prop_pos, act_pos):
    return {
        "vlm": A(vlm_pos).astype(jnp.int32),
        "proprio": A(prop_pos).astype(jnp.int32),
        "action": A(act_pos).astype(jnp.int32),
    }


# ---------------------------------------------------------------------------
# (a) Masks + position ids
# ---------------------------------------------------------------------------


class TestMasks:
    def test_full_mask_and_positions(self):
        full, prefix, action, vlm_pos, prop_pos, act_pos = ref_masks(ATTN_MASK)
        am = jnp.asarray(ATTN_MASK)
        mine_full = mask_lib.pi0_full_mask(am, M_IMG_TEXT, N_PROPRIO, N_ACTION)
        # reference additive mask: 0 where allowed, finfo.min where masked
        np.testing.assert_array_equal(
            np.asarray(mine_full), t2n(full[:, 0]) == 0
        )
        mine_prefix = mask_lib.pi0_prefix_mask(am, M_IMG_TEXT, N_PROPRIO)
        np.testing.assert_array_equal(
            np.asarray(mine_prefix), t2n(prefix[:, 0]) == 0
        )
        mine_action = mask_lib.pi0_action_mask(am, M_IMG_TEXT, N_PROPRIO, N_ACTION)
        np.testing.assert_array_equal(
            np.asarray(mine_action), t2n(action[:, 0]) == 0
        )
        v, p, a = mask_lib.pi0_position_ids(B, M_IMG_TEXT, N_PROPRIO, N_ACTION)
        np.testing.assert_array_equal(np.asarray(v), t2n(vlm_pos))
        np.testing.assert_array_equal(np.asarray(p), t2n(prop_pos))
        np.testing.assert_array_equal(np.asarray(a), t2n(act_pos))

    def test_additive_from_bool_matches_reference_format(self):
        full, *_ = ref_masks(ATTN_MASK)
        am = jnp.asarray(ATTN_MASK)
        mine_full = mask_lib.pi0_full_mask(am, M_IMG_TEXT, N_PROPRIO, N_ACTION)
        add = mask_lib.additive_from_bool(mine_full, jnp.float32)
        np.testing.assert_array_equal(np.asarray(add), t2n(full))


# ---------------------------------------------------------------------------
# (b) Joint engine: all three cache modes
# ---------------------------------------------------------------------------


class TestJointEngine:
    def _run_ref_prefill(self, jm, prefix_add, vlm_pos, prop_pos, embeds):
        kv_caches = jm.build_mixture_caches()
        jm(
            attention_mask=prefix_add,
            position_ids_all={"vlm": vlm_pos, "proprio": prop_pos},
            embeds_all={
                "vlm": embeds["vlm"].clone(),
                "proprio": embeds["proprio"].clone(),
            },
            kv_caches=kv_caches,
            return_caches=True,
        )
        return kv_caches

    def test_prefill_cache_contents(self):
        jm, params, spec = build_models()
        _, prefix_add, _, vlm_pos, prop_pos, _ = ref_masks(ATTN_MASK)
        embeds = embeds_for(joint_cfg()["mixture"])
        kv_caches = self._run_ref_prefill(jm, prefix_add, vlm_pos, prop_pos, embeds)

        am = jnp.asarray(ATTN_MASK)
        prefix_mask = mask_lib.pi0_prefix_mask(am, M_IMG_TEXT, N_PROPRIO)
        k, v = joint_lib.prefill(
            params,
            spec,
            {"vlm": A(embeds["vlm"]), "proprio": A(embeds["proprio"])},
            {
                "vlm": A(vlm_pos).astype(jnp.int32),
                "proprio": A(prop_pos).astype(jnp.int32),
            },
            prefix_mask,
        )
        for layer in range(spec.num_hidden_layers):
            kr_v, vr_v = kv_caches["vlm"].get(layer)
            kr_p, vr_p = kv_caches["proprio"].get(layer)
            close(k[layer], np.concatenate([t2n(kr_v), t2n(kr_p)], axis=-2))
            close(v[layer], np.concatenate([t2n(vr_v), t2n(vr_p)], axis=-2))

    def test_decode_append_non_active(self):
        jm, params, spec = build_models()
        _, prefix_add, action_add, vlm_pos, prop_pos, act_pos = ref_masks(ATTN_MASK)
        embeds = embeds_for(joint_cfg()["mixture"])
        kv_caches = self._run_ref_prefill(jm, prefix_add, vlm_pos, prop_pos, embeds)

        am = jnp.asarray(ATTN_MASK)
        prefix_mask = mask_lib.pi0_prefix_mask(am, M_IMG_TEXT, N_PROPRIO)
        action_mask = mask_lib.pi0_action_mask(am, M_IMG_TEXT, N_PROPRIO, N_ACTION)
        cache = joint_lib.prefill(
            params,
            spec,
            {"vlm": A(embeds["vlm"]), "proprio": A(embeds["proprio"])},
            {
                "vlm": A(vlm_pos).astype(jnp.int32),
                "proprio": A(prop_pos).astype(jnp.int32),
            },
            prefix_mask,
        )
        # two flow steps with different action embeds, reusing the cache
        g = torch.Generator().manual_seed(7)
        for _ in range(2):
            act = torch.randn(B, N_ACTION, 16, generator=g)
            out_ref = jm(
                attention_mask=action_add,
                position_ids_all={"action": act_pos},
                embeds_all={"action": act.clone()},
                kv_caches=kv_caches,
                cache_mode="append_non_active",
            )["action"]
            out_mine = joint_lib.decode(
                params,
                spec,
                A(act),
                A(act_pos).astype(jnp.int32),
                cache,
                action_mask,
            )
            close(out_mine, t2n(out_ref))

    def test_naive_no_append(self):
        jm, params, spec = build_models(seed=3)
        full_add, _, _, vlm_pos, prop_pos, act_pos = ref_masks(ATTN_MASK)
        embeds = embeds_for(joint_cfg()["mixture"], seed=5)
        kv_caches = jm.build_mixture_caches()

        am = jnp.asarray(ATTN_MASK)
        full_mask = mask_lib.pi0_full_mask(am, M_IMG_TEXT, N_PROPRIO, N_ACTION)
        pos = position_ids_jnp(vlm_pos, prop_pos, act_pos)
        g = torch.Generator().manual_seed(11)
        # two denoising steps: the second exercises the reference's cached
        # no_append branch (vlm/proprio KV reused from step one)
        for _ in range(2):
            act = torch.randn(B, N_ACTION, 16, generator=g)
            out_ref = jm(
                attention_mask=full_add,
                position_ids_all={
                    "vlm": vlm_pos,
                    "proprio": prop_pos,
                    "action": act_pos,
                },
                embeds_all={
                    "vlm": embeds["vlm"].clone(),
                    "proprio": embeds["proprio"].clone(),
                    "action": act.clone(),
                },
                kv_caches=kv_caches,
                cache_mode="no_append",
            )["action"]
            out_mine = joint_lib.naive_forward(
                params,
                spec,
                {
                    "vlm": A(embeds["vlm"]),
                    "proprio": A(embeds["proprio"]),
                    "action": A(act),
                },
                pos,
                full_mask,
            )
            close(out_mine, t2n(out_ref))

    def test_text_append_mode(self):
        # single active vlm mixture with a final norm (text-generation shape,
        # reference infer_text pizero.py:616-642: cache_mode="append",
        # final_layer_post_attn_skip_names=[])
        cfg = joint_cfg()
        cfg["mixture"]["vlm"]["use_final_norm"] = True
        jm = ref.joint_model.JointModel(DotDict(cfg)).eval()
        randomize_(jm, seed=9)
        params = jax.tree.map(jnp.asarray, bridge_joint(jm))
        spec = JointSpec(
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg["num_key_value_heads"],
            head_dim=cfg["head_dim"],
            mixtures={
                "vlm": MixtureSpec(
                    hidden_size=32, intermediate_size=64, use_final_norm=True
                )
            },
        )
        S, MAXLEN = 4, 6
        g = torch.Generator().manual_seed(13)
        prompt = torch.randn(B, S, 32, generator=g)

        # --- reference: prefill S tokens (zero mask: full mutual attention,
        # build_causal_mask_and_position_ids_for_text pizero.py:394-428)
        kv = jm.build_mixture_caches()
        pos_prefill = torch.arange(1, S + 1)[None].repeat(B, 1)
        mask0 = torch.zeros(B, 1, S, S)
        out_ref = jm(
            attention_mask=mask0,
            position_ids_all={"vlm": pos_prefill},
            embeds_all={"vlm": prompt.clone()},
            kv_caches=kv,
            cache_mode="append",
            final_layer_post_attn_skip_names=[],
        )["vlm"]

        # --- mine: single_forward into a preallocated buffer
        cache = joint_lib.alloc_single_cache(spec, B, MAXLEN, jnp.float32)
        cols = jnp.arange(MAXLEN)[None, None, :]
        mask_prefill = jnp.broadcast_to(cols < S, (B, S, MAXLEN))
        out_mine, cache = joint_lib.single_forward(
            params,
            spec,
            "vlm",
            A(prompt),
            jnp.asarray(pos_prefill.numpy(), jnp.int32),
            mask_prefill,
            cache=cache,
            cache_len=jnp.int32(0),
        )
        close(out_mine, t2n(out_ref))

        # --- one decode token
        tok = torch.randn(B, 1, 32, generator=g)
        pos_dec = torch.full((B, 1), S + 1, dtype=torch.long)
        mask1 = torch.zeros(B, 1, 1, S + 1)
        out_ref2 = jm(
            attention_mask=mask1,
            position_ids_all={"vlm": pos_dec},
            embeds_all={"vlm": tok.clone()},
            kv_caches=kv,
            cache_mode="append",
            final_layer_post_attn_skip_names=[],
        )["vlm"]
        mask_dec = jnp.broadcast_to(cols < S + 1, (B, 1, MAXLEN))
        out_mine2, cache = joint_lib.single_forward(
            params,
            spec,
            "vlm",
            A(tok),
            jnp.asarray(pos_dec.numpy(), jnp.int32),
            mask_dec,
            cache=cache,
            cache_len=jnp.int32(S),
        )
        close(out_mine2, t2n(out_ref2))

    @pytest.mark.parametrize("mode", ["adaLN", "adaLN-Zero"])
    def test_adaptive_naive(self, mode):
        jm, params, spec = build_models(adaptive_mode=mode, seed=21)
        full_add, _, _, vlm_pos, prop_pos, act_pos = ref_masks(ATTN_MASK)
        embeds = embeds_for(joint_cfg()["mixture"], seed=23)
        g = torch.Generator().manual_seed(29)
        act = torch.randn(B, N_ACTION, 16, generator=g)
        time_cond = torch.randn(B, 12, generator=g)

        out_ref = jm(
            attention_mask=full_add,
            position_ids_all={
                "vlm": vlm_pos,
                "proprio": prop_pos,
                "action": act_pos,
            },
            embeds_all={
                "vlm": embeds["vlm"].clone(),
                "proprio": embeds["proprio"].clone(),
                "action": act.clone(),
            },
            time_cond=time_cond,
            kv_caches={},
            cache_mode="no_append",
        )["action"]

        am = jnp.asarray(ATTN_MASK)
        full_mask = mask_lib.pi0_full_mask(am, M_IMG_TEXT, N_PROPRIO, N_ACTION)
        out_mine = joint_lib.naive_forward(
            params,
            spec,
            {
                "vlm": A(embeds["vlm"]),
                "proprio": A(embeds["proprio"]),
                "action": A(act),
            },
            position_ids_jnp(vlm_pos, prop_pos, act_pos),
            full_mask,
            time_cond=A(time_cond),
        )
        close(out_mine, t2n(out_ref))


# ---------------------------------------------------------------------------
# Micro-parity: Gemma primitives
# ---------------------------------------------------------------------------


class TestGemmaPrimitives:
    def test_rms_norm_fp32_and_bf16(self):
        from blurr_tpu.ops.norms import rms_norm

        norm = ref.pg_modules.GemmaRMSNorm(16)
        norm.weight.data = torch.randn(16) * 0.3
        x = torch.randn(2, 5, 16)
        close(rms_norm(A(x), A(norm.weight)), t2n(norm(x)), atol=1e-6, rtol=1e-6)
        # bf16: the (x * w).to(bf16) downcast-ordering must match bit-exactly
        xb = x.to(torch.bfloat16)
        out_ref = norm(xb)
        out_mine = rms_norm(A(x).astype(jnp.bfloat16), A(norm.weight))
        np.testing.assert_array_equal(
            np.asarray(out_mine).astype(np.float32),
            out_ref.float().numpy(),
        )

    def test_rope(self):
        from blurr_tpu.ops.rotary import apply_rope, rope_cos_sin

        emb = ref.pg_modules.GemmaRotaryEmbedding(8, base=10000.0)
        pos = torch.tensor([[1, 2, 5, 9], [3, 1, 1, 7]])
        x = torch.randn(2, 4, 4, 8)  # [B, H, S, D]
        cos_r, sin_r = emb(x, pos)
        states_r = ref.model_utils.apply_rotary_pos_emb(x, cos_r, sin_r)

        cos_m, sin_m = rope_cos_sin(jnp.asarray(pos.numpy()), 8, 10000.0)
        close(cos_m, t2n(cos_r), atol=1e-6, rtol=1e-6)
        close(sin_m, t2n(sin_r), atol=1e-6, rtol=1e-6)
        close(apply_rope(A(x), cos_m, sin_m), t2n(states_r), atol=1e-6, rtol=1e-6)

    def test_gemma_mlp(self):
        cfg = DotDict(dict(hidden_size=16, intermediate_size=32))
        mlp = ref.pg_modules.GemmaMLP(cfg)
        randomize_(mlp, seed=31, scale=0.5)
        x = torch.randn(2, 5, 16)
        lp = {
            "gate_w": A(mlp.gate_proj.weight).T,
            "up_w": A(mlp.up_proj.weight).T,
            "down_w": A(mlp.down_proj.weight).T,
        }
        close(joint_lib._mlp(lp, A(x)), t2n(mlp(x)), atol=1e-6, rtol=1e-5)

    def test_int8_weight_quant(self):
        from blurr_tpu.ops.quant import mm, quantize_weight_int8

        lin = torch.nn.Linear(16, 24)
        randomize_(lin, seed=37, scale=0.7)
        cfg = ref.quant.Int8QuantConfig(activation_clip=0.8)
        qlin = ref.quant.QuantizedLinear.from_linear(lin, cfg)
        w = quantize_weight_int8(A(lin.weight).T)
        np.testing.assert_array_equal(
            np.asarray(w["q"]), t2n(qlin.weight_i8).T.astype(np.float32)
        )
        close(w["s"], t2n(qlin.weight_scale), atol=1e-7, rtol=1e-6)
        x = torch.randn(3, 16) * 2  # exceeds the clip on some entries
        out_mine = mm(A(x), w, activation_clip=0.8) + A(lin.bias)
        close(out_mine, t2n(qlin(x)), atol=1e-5, rtol=1e-5)
        # cached-fp mode
        cfg_fp = ref.quant.Int8QuantConfig(cache_fp_weight=True, fp_dtype="float32")
        qlin_fp = ref.quant.QuantizedLinear.from_linear(lin, cfg_fp)
        w_fp = quantize_weight_int8(A(lin.weight).T, cache_fp_dtype=jnp.float32)
        out_mine = mm(A(x), w_fp) + A(lin.bias)
        close(out_mine, t2n(qlin_fp(x)), atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# (c) SigLIP tower + projector
# ---------------------------------------------------------------------------


class TestSiglip:
    CFG = dict(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_channels=3,
        image_size=8,
        patch_size=4,
        layer_norm_eps=1e-6,
        attention_dropout=0.0,
        num_image_tokens=4,
    )

    def test_tower(self):
        vm = ref.siglip.SiglipVisionModel(DotDict(self.CFG)).eval()
        randomize_(vm, seed=41)
        params = jax.tree.map(jnp.asarray, bridge_siglip(vm))
        px = torch.randn(2, 3, 8, 8)
        out_ref = vm(px)
        out_mine = siglip_forward(params, A(px), self.CFG)
        close(out_mine, t2n(out_ref), atol=1e-5, rtol=1e-4)

    def test_projector(self):
        cfg = DotDict(dict(vision_config=dict(hidden_size=32, projection_dim=16)))
        proj = ref.siglip.PaliGemmaMultiModalProjector(cfg)
        randomize_(proj, seed=43)
        x = torch.randn(2, 4, 32)
        params = {"w": A(proj.linear.weight).T, "b": A(proj.linear.bias)}
        close(projector_forward(params, A(x)), t2n(proj(x)), atol=1e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# (d) int8 KV cache
# ---------------------------------------------------------------------------


class TestKVInt8:
    @pytest.mark.parametrize("clip", [None, 0.5])
    def test_quant_dequant(self, clip):
        from blurr_tpu.ops.quant import dequantize_kv, quantize_kv_int8

        qc = {"mode": "int8", "activation_clip": clip, "dtype": "bfloat16"}
        cache = ref.kv_cache.KVCache(qc)
        g = torch.Generator().manual_seed(47)
        L = 2
        ks = [torch.randn(B, 2, 5, 8, generator=g) for _ in range(L)]
        vs = [torch.randn(B, 2, 5, 8, generator=g) for _ in range(L)]
        for layer in range(L):
            cache.update(ks[layer], vs[layer], layer)

        k_stack = jnp.asarray(np.stack([t2n(k) for k in ks]))
        v_stack = jnp.asarray(np.stack([t2n(v) for v in vs]))
        kq, kscale = quantize_kv_int8(k_stack, clip=clip)
        vq, vscale = quantize_kv_int8(v_stack, clip=clip)
        for layer in range(L):
            kr, vr = cache.get(layer)
            mine_k = dequantize_kv(kq[layer], kscale[layer], jnp.bfloat16)
            mine_v = dequantize_kv(vq[layer], vscale[layer], jnp.bfloat16)
            np.testing.assert_array_equal(
                np.asarray(mine_k).astype(np.float32), kr.float().numpy()
            )
            np.testing.assert_array_equal(
                np.asarray(mine_v).astype(np.float32), vr.float().numpy()
            )


# ---------------------------------------------------------------------------
# (e) VLAProcessor
# ---------------------------------------------------------------------------


class TestProcessor:
    def test_prompt_padding_and_pixels(self):
        from blurr_tpu.models.pi0.processing import StubTokenizer, VLAProcessor

        texts = ["pick up the spoon", "close the drawer now please"]
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (2, 3, 4, 4), dtype=np.uint8)

        proc_ref = ref.vla_processing.VLAProcessor(
            StubTokenizer(), num_image_tokens=3, max_seq_len=12
        )
        out_ref = proc_ref(texts, torch.tensor(imgs))
        proc_mine = VLAProcessor(StubTokenizer(), num_image_tokens=3, max_seq_len=12)
        out_mine = proc_mine(texts, imgs)

        np.testing.assert_array_equal(
            np.asarray(out_mine["input_ids"]), np.asarray(out_ref["input_ids"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_mine["attention_mask"]),
            np.asarray(out_ref["attention_mask"]),
        )
        close(out_mine["pixel_values"], t2n(out_ref["pixel_values"]),
              atol=1e-6, rtol=1e-6)

    def test_prompt_string(self):
        from blurr_tpu.models.pi0.processing import add_image_tokens_to_prompt

        assert add_image_tokens_to_prompt(
            "pick", "<bos>", 3, "<image>"
        ) == ref.vla_processing.add_image_tokens_to_prompt("pick", "<bos>", 3, "<image>")


# ---------------------------------------------------------------------------
# (f) Geometry
# ---------------------------------------------------------------------------


class TestGeometry:
    def test_euler_quat_mat_roundtrips(self):
        from blurr_tpu.utils import geometry as g

        rng = np.random.RandomState(3)
        for _ in range(20):
            ai, aj, ak = rng.uniform(-np.pi, np.pi, 3)
            aj *= 0.49  # stay away from the gimbal singularity
            close(g.euler2mat(ai, aj, ak), ref.geometry.euler2mat(ai, aj, ak),
                  atol=1e-9, rtol=1e-9)
            close(g.euler2quat(ai, aj, ak), ref.geometry.euler2quat(ai, aj, ak),
                  atol=1e-9, rtol=1e-9)
            mat = np.asarray(ref.geometry.euler2mat(ai, aj, ak))
            close(g.mat2euler(mat), ref.geometry.mat2euler(mat), atol=1e-9, rtol=1e-9)
            q = np.asarray(ref.geometry.euler2quat(ai, aj, ak))
            close(g.quat2mat(q), ref.geometry.quat2mat(q), atol=1e-9, rtol=1e-9)
            close(g.quat2euler(q), ref.geometry.quat2euler(q), atol=1e-8, rtol=1e-8)
            ax_m, ang_m = g.quat2axangle(q)
            ax_r, ang_r = ref.geometry.quat2axangle(q)
            close(ax_m, np.asarray(ax_r), atol=1e-8, rtol=1e-8)
            close(ang_m, ang_r, atol=1e-9, rtol=1e-8)
            ax_m, ang_m = g.euler2axangle(ai, aj, ak)
            ax_r, ang_r = ref.geometry.euler2axangle(ai, aj, ak)
            close(ax_m, np.asarray(ax_r), atol=1e-8, rtol=1e-8)
            close(ang_m, ang_r, atol=1e-9, rtol=1e-8)

    def test_identity_quat(self):
        from blurr_tpu.utils import geometry as g

        q = np.array([1.0, 0.0, 0.0, 0.0])
        ax_m, ang_m = g.quat2axangle(q)
        ax_r, ang_r = ref.geometry.quat2axangle(q)
        close(ax_m, np.asarray(ax_r), atol=1e-12, rtol=1e-12)
        assert abs(ang_m - ang_r) < 1e-12


# ---------------------------------------------------------------------------
# Aux VLA modules
# ---------------------------------------------------------------------------


class TestAuxModules:
    def test_sinusoidal_pos_emb(self):
        from blurr_tpu.ops.embeddings import sinusoidal_pos_emb

        mod = ref.vla_modules.SinusoidalPosEmb(16, max_period=10000.0)
        t = torch.tensor([0.0, 0.1, 0.5, 0.93])
        close(sinusoidal_pos_emb(A(t), 16), t2n(mod(t)), atol=1e-6, rtol=1e-6)

    def test_gaussian_fourier(self):
        from blurr_tpu.ops.embeddings import GaussianFourierFeatureTransform

        mod = ref.vla_modules.GaussianFourierFeatureTransform(4, embed_dim=8)
        mine = GaussianFourierFeatureTransform(4, embed_dim=8)
        mine.b = A(mod.b)  # bridge the fixed projection
        v = torch.randn(3, 4)
        # args reach ~2*pi*|v|*|b| ~ 60 with scale-10 features: torch/XLA sin
        # range reduction differs by a few ulp there, so tolerance is looser
        close(mine(A(v)), t2n(mod(v)), atol=1e-4, rtol=1e-4)

    def test_adaptive_rms_norm(self):
        from blurr_tpu.ops.norms import adaptive_rms_norm

        mod = ref.vla_modules.AdaptiveRMSNorm(16, 8)
        randomize_(mod, seed=53, scale=0.5)
        x = torch.randn(2, 5, 16)
        cond = torch.randn(2, 8)
        params = {
            "to_gamma_w": A(mod.to_gamma[0].weight).T,
            "to_gamma_b": A(mod.to_gamma[0].bias),
            "to_beta_w": A(mod.to_beta.weight).T,
        }
        close(
            adaptive_rms_norm(A(x), A(cond), params),
            t2n(mod(x, cond)),
            atol=1e-6,
            rtol=1e-5,
        )

    def test_adaptive_layerscale(self):
        from blurr_tpu.ops.norms import adaptive_layerscale

        mod = ref.vla_modules.AdaptiveLayerscale(16, 8)
        randomize_(mod, seed=59, scale=0.5)
        x = torch.randn(2, 5, 16)
        cond = torch.randn(2, 8)
        params = {
            "gamma_w": A(mod.to_adaln_zero_gamma.weight).T,
            "gamma_b": A(mod.to_adaln_zero_gamma.bias),
        }
        close(
            adaptive_layerscale(A(x), A(cond), params),
            t2n(mod(x, cond)),
            atol=1e-6,
            rtol=1e-5,
        )

    def test_action_encoder_time_cond(self):
        """Reference ActionEncoder with time_cond=True (non-adaptive pi0
        path: time embedding concatenated FIRST, vla/modules.py:40-53)."""
        mod = ref.vla_modules.ActionEncoder(7, 16, time_cond=True)
        randomize_(mod, seed=61, scale=0.4)
        action = torch.randn(2, 3, 7)
        time_emb = torch.randn(2, 16)
        out_ref = mod(action, time_emb)

        # mirror of pizero._encode_action's parameter layout
        ae = {
            "w1": A(mod.linear_1.weight).T,
            "b1": A(mod.linear_1.bias),
            "w2": A(mod.linear_2.weight).T,
            "b2": A(mod.linear_2.bias),
            "w3": A(mod.linear_3.weight).T,
            "b3": A(mod.linear_3.bias),
        }
        emb = A(action) @ ae["w1"] + ae["b1"]
        t_full = jnp.broadcast_to(A(time_emb)[:, None, :], (2, 3, 16))
        emb = jnp.concatenate([t_full, emb], axis=-1)
        emb = jax.nn.silu(emb @ ae["w2"] + ae["b2"])
        out_mine = emb @ ae["w3"] + ae["b3"]
        close(out_mine, t2n(out_ref), atol=1e-6, rtol=1e-5)
