"""Independent full-forward oracle: a flat numpy implementation of the Pi-0
control step written directly from the documented semantics (SURVEY.md §2.2 /
the reference's math), sharing NO code with the JAX engine. Catches
composition bugs (norm placement, residual order, embed scaling, cache
semantics) that per-op unit tests cannot."""

import numpy as np
import pytest

import jax

from blurr_tpu.models.pi0.pizero import PiZero
from tests.util import tiny_inputs, tiny_pi0_cfg


def np_rms(x, w, eps=1e-6):
    x64 = x.astype(np.float64)
    n = x64 / np.sqrt((x64**2).mean(-1, keepdims=True) + eps)
    return (n * (1.0 + w)).astype(np.float32)


def np_rope(x, pos, theta):
    # x [B, H, S, D]; rotate pairs (i, i+D/2) by pos * theta^(-2i/D)
    d = x.shape[-1]
    inv = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    ang = pos[:, None, :, None] * inv[None, None, None, :]  # [B,1,S,D/2]
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1).astype(
        np.float32
    )


def np_attn(q, k, v, mask, clamp=50.0):
    # q [B,NH,Sq,D], k/v [B,KVH,Skv,D], mask bool [B,Sq,Skv]
    b, nh, sq, d = q.shape
    rep = nh // k.shape[1]
    k = np.repeat(k, rep, 1)
    v = np.repeat(v, rep, 1)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    logits = np.tanh(logits / clamp) * clamp
    logits = np.where(mask[:, None], logits, np.finfo(np.float32).min)
    logits = logits - logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v)


def np_gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def np_layer_norm(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def split_heads(x, nh, hd):
    b, s, _ = x.shape
    return x.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, nh, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)


def oracle_infer_action(P, cfg, ids, am, px, proprio, noise):
    """Flat-numpy Pi-0 control step (prefill + flow steps with cached KV)."""
    jc = cfg["joint"]["config"]
    NH, KVH, D = jc["num_attention_heads"], jc["num_key_value_heads"], jc["head_dim"]
    L = jc["num_hidden_layers"]
    theta = 10000.0
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    S = cfg["max_image_text_tokens"]
    A = cfg["horizon_steps"]
    steps = cfg["num_inference_steps"]
    B = ids.shape[0]

    # --- siglip ---
    vp = P["siglip"]
    p_sz = cfg["vision"]["config"]["patch_size"]
    vh = cfg["vision"]["config"]["hidden_size"]
    v_nh = cfg["vision"]["config"]["num_attention_heads"]
    v_hd = vh // v_nh
    img = px.transpose(0, 2, 3, 1)  # NHWC
    nh_p = img.shape[1] // p_sz
    patches = (
        img.reshape(B, nh_p, p_sz, nh_p, p_sz, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, nh_p * nh_p, -1)
    )
    h = patches @ P["siglip"]["patch_w"] + P["siglip"]["patch_b"]
    h = h + vp["pos_embed"][None]
    lay = vp["layers"]
    for i in range(cfg["vision"]["config"]["num_hidden_layers"]):
        x = np_layer_norm(h, lay["ln1_w"][i], lay["ln1_b"][i])
        q = split_heads(x @ lay["q_w"][i] + lay["q_b"][i], v_nh, v_hd)
        k = split_heads(x @ lay["k_w"][i] + lay["k_b"][i], v_nh, v_hd)
        v = split_heads(x @ lay["v_w"][i] + lay["v_b"][i], v_nh, v_hd)
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(v_hd)
        logits -= logits.max(-1, keepdims=True)
        w = np.exp(logits)
        w /= w.sum(-1, keepdims=True)
        attn = merge_heads(np.einsum("bhqk,bhkd->bhqd", w, v))
        h = h + attn @ lay["out_w"][i] + lay["out_b"][i]
        x = np_layer_norm(h, lay["ln2_w"][i], lay["ln2_b"][i])
        h = h + np_gelu_tanh(x @ lay["fc1_w"][i] + lay["fc1_b"][i]) @ lay["fc2_w"][i] + lay["fc2_b"][i]
    feats = np_layer_norm(h, vp["post_ln_w"], vp["post_ln_b"])
    feats = feats @ P["projector"]["w"] + P["projector"]["b"]
    vlm_h = cfg["mixture"]["vlm"]["hidden_size"]
    feats = feats / np.sqrt(vlm_h)

    # --- embed merge (image tokens first, pads zero) ---
    emb = P["embed_tokens"][ids]
    text_mask = (ids != cfg["image_token_index"]) & (ids != cfg["pad_token_id"])
    merged = np.where(text_mask[..., None], emb, 0.0)
    img_mask = ids[:, :n_img] == cfg["image_token_index"]
    merged[:, :n_img][img_mask] = feats.reshape(-1, vlm_h)[img_mask.reshape(-1)]

    prop = proprio @ P["proprio_encoder"]["w"] + P["proprio_encoder"]["b"]

    # --- masks & positions ---
    cnt = am.sum(1)
    Pfx = S + 1
    pm = np.zeros((B, Pfx, Pfx), bool)
    for b in range(B):
        pm[b, : cnt[b], : cnt[b]] = True
        pm[b, S:, : cnt[b]] = True
    pm[:, S:, S:] = True
    total = Pfx + A
    amask = np.zeros((B, A, total), bool)
    for b in range(B):
        amask[b, :, : cnt[b]] = True
    amask[:, :, S:] = True
    vlm_pos = np.tile(np.arange(1, S + 1)[None], (B, 1)).astype(np.float64)
    prop_pos = np.ones((B, 1))
    act_pos = np.tile(np.arange(2, 2 + A)[None], (B, 1)).astype(np.float64)

    # --- prefill ---
    J = P["joint"]
    hv = merged * np.float32(np.sqrt(vlm_h))
    hp = prop * np.float32(np.sqrt(prop.shape[-1]))
    kc, vc = [], []
    for i in range(L):
        xs = {}
        qs, ks, vs = [], [], []
        for name, hh, pos in (("vlm", hv, vlm_pos), ("proprio", hp, prop_pos)):
            m = J[name]
            x = np_rms(hh, m["input_norm"]["scale"][i])
            xs[name] = x
            q = np_rope(split_heads(x @ m["q_w"][i], NH, D), pos, theta)
            k = np_rope(split_heads(x @ m["k_w"][i], KVH, D), pos, theta)
            v = split_heads(x @ m["v_w"][i], KVH, D)
            qs.append(q); ks.append(k); vs.append(v)
        q = np.concatenate(qs, 2); k = np.concatenate(ks, 2); v = np.concatenate(vs, 2)
        kc.append(k); vc.append(v)
        attn = merge_heads(np_attn(q, k, v, pm))
        a_v, a_p = attn[:, :S], attn[:, S:]
        for name, hh, a in (("vlm", hv, a_v), ("proprio", hp, a_p)):
            m = J[name]
            h2 = hh + a @ m["o_w"][i]
            x = np_rms(h2, m["post_norm"]["scale"][i])
            out = np_gelu_tanh(x @ m["gate_w"][i]) * (x @ m["up_w"][i])
            h2 = h2 + out @ m["down_w"][i]
            if name == "vlm":
                hv = h2
            else:
                hp = h2

    # --- flow integration ---
    act = noise.copy()
    t = np.zeros(B, np.float32)
    dt = 1.0 / steps
    aw = cfg["mixture"]["action"]["hidden_size"]
    ae = P["action_encoder"]
    for _ in range(steps):
        half = aw // 2
        sc = np.log(10000.0) / (half - 1)
        freqs = np.exp(np.arange(half) * -sc)
        targ = t[:, None] * freqs[None]
        temb = np.concatenate([np.sin(targ), np.cos(targ)], -1).astype(np.float32)
        e = act @ ae["w1"] + ae["b1"]
        tfull = np.tile(temb[:, None], (1, A, 1))
        e = np.concatenate([tfull, e], -1)
        z = e @ ae["w2"] + ae["b2"]
        e = (z / (1 + np.exp(-z))) @ ae["w3"] + ae["b3"]  # silu

        ha = e * np.float32(np.sqrt(aw))
        m = J["action"]
        for i in range(L):
            x = np_rms(ha, m["input_norm"]["scale"][i])
            q = np_rope(split_heads(x @ m["q_w"][i], NH, D), act_pos, theta)
            k = np_rope(split_heads(x @ m["k_w"][i], KVH, D), act_pos, theta)
            v = split_heads(x @ m["v_w"][i], KVH, D)
            kf = np.concatenate([kc[i], k], 2)
            vf = np.concatenate([vc[i], v], 2)
            a = merge_heads(np_attn(q, kf, vf, amask)) @ m["o_w"][i]
            ha = ha + a
            x = np_rms(ha, m["post_norm"]["scale"][i])
            ha = ha + (np_gelu_tanh(x @ m["gate_w"][i]) * (x @ m["up_w"][i])) @ m["down_w"][i]
        ha = np_rms(ha, m["final_norm"]["scale"])
        vel = ha @ P["action_decoder"]["w"] + P["action_decoder"]["b"]
        act = act + dt * vel
        t = t + dt
    return np.clip(act, -1.0, 1.0)


def test_full_forward_matches_numpy_oracle():
    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    inputs = tiny_inputs(cfg)

    ours = np.asarray(model.infer_action(params, **inputs))

    P = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    oracle = oracle_infer_action(
        P,
        cfg,
        np.asarray(inputs["input_ids"]),
        np.asarray(inputs["attention_mask"]),
        np.asarray(inputs["pixel_values"], np.float32),
        np.asarray(inputs["proprios"], np.float32),
        np.asarray(inputs["noise"], np.float32),
    )
    np.testing.assert_allclose(ours, oracle, rtol=5e-4, atol=5e-4)
