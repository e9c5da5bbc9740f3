"""Analytic FLOP accounting for the VLA forwards.

The reference counts FLOPs with torch.profiler(with_flops=True)
(scripts/benchmark_pi0.py:262-281). All matmul shapes here are static, so an
analytic count is exact for the dominant terms (dense matmuls + attention);
elementwise ops are ignored, matching the profiler's matmul-only accounting.
"""

from __future__ import annotations


def _mm(m: int, k: int, n: int) -> int:
    """FLOPs of an [m,k]@[k,n] matmul."""
    return 2 * m * k * n


def siglip_flops(cfg: dict, batch: int = 1) -> int:
    d = cfg["hidden_size"]
    inter = cfg["intermediate_size"]
    nl = cfg["num_hidden_layers"]
    p = cfg["patch_size"]
    n = (cfg["image_size"] // p) ** 2
    c = cfg.get("num_channels", 3)
    total = _mm(n, p * p * c, d)  # patch embed
    per_layer = (
        4 * _mm(n, d, d)  # q, k, v, out projections
        + 2 * 2 * n * n * d  # qk^T and attn @ v
        + _mm(n, d, inter)
        + _mm(n, inter, d)
    )
    return batch * (total + nl * per_layer)


def _mixture_layer_flops(seq: int, kv_len: int, hidden: int, inter: int,
                         nh: int, kvh: int, hd: int) -> int:
    qf = _mm(seq, hidden, nh * hd)
    kvf = 2 * _mm(seq, hidden, kvh * hd)
    of = _mm(seq, nh * hd, hidden)
    attn = 2 * 2 * seq * kv_len * nh * hd
    mlp = 2 * _mm(seq, hidden, inter) + _mm(seq, inter, hidden)
    return qf + kvf + of + attn + mlp


def pi0_forward_flops(cfg: dict, use_cache: bool = True, batch: int = 1) -> int:
    """FLOPs of one PiZeroInference forward (prefill + all flow steps)."""
    jc = dict(cfg["joint"]["config"])
    nl = jc["num_hidden_layers"]
    nh, kvh, hd = (
        jc["num_attention_heads"],
        jc["num_key_value_heads"],
        jc["head_dim"],
    )
    mix = cfg["mixture"]
    s_img_txt = cfg["max_image_text_tokens"]
    s_p = cfg["cond_steps"]
    s_a = cfg["horizon_steps"]
    steps = cfg["num_inference_steps"]
    prefix = s_img_txt + s_p
    total_tok = prefix + s_a

    vlm_h, vlm_i = mix["vlm"]["hidden_size"], mix["vlm"]["intermediate_size"]
    act_h, act_i = mix["action"]["hidden_size"], mix["action"]["intermediate_size"]
    prop_h, prop_i = (
        mix["proprio"]["hidden_size"],
        mix["proprio"]["intermediate_size"],
    )

    vision = siglip_flops(dict(cfg["vision"]["config"]), batch)
    vision += _mm(
        cfg["vision"]["config"]["num_image_tokens"],
        cfg["vision_projector"]["config"]["vision_config"]["hidden_size"],
        cfg["vision_projector"]["config"]["vision_config"]["projection_dim"],
    ) * batch

    def layer(seq, kv, h, i):
        return _mixture_layer_flops(seq, kv, h, i, nh, kvh, hd)

    decode_step = nl * layer(s_a, total_tok, act_h, act_i)
    if use_cache:
        prefill = nl * (layer(s_img_txt, prefix, vlm_h, vlm_i)
                        + layer(s_p, prefix, prop_h, prop_i))
        joint = prefill + steps * decode_step
    else:
        per_step = nl * (
            layer(s_img_txt, total_tok, vlm_h, vlm_i)
            + layer(s_p, total_tok, prop_h, prop_i)
            + layer(s_a, total_tok, act_h, act_i)
        )
        joint = steps * per_step

    enc = steps * batch * (
        _mm(s_a, cfg["action_dim"], act_h)
        + _mm(s_a, 2 * act_h, act_h)
        + _mm(s_a, act_h, act_h)
        + _mm(s_a, act_h, cfg["action_dim"])
    )
    enc += batch * _mm(s_p, cfg["proprio_dim"], prop_h)
    return vision + batch * joint + enc


def vit_flops(spec, batch: int = 1) -> int:
    """FLOPs of one ViT forward (blurr_tpu.models.openvla.vit.ViTSpec)."""
    d, inter = spec.hidden_size, spec.intermediate_size
    n = spec.num_patches + spec.num_prefix_tokens
    nl = spec.effective_num_layers
    p, c = spec.patch_size, spec.num_channels
    total = _mm(spec.num_patches, p * p * c, d)
    per_layer = (
        _mm(n, d, 3 * d) + _mm(n, d, d) + 2 * 2 * n * n * d
        + _mm(n, d, inter) + _mm(n, inter, d)
    )
    return batch * (total + nl * per_layer)


def llama_layer_flops(spec, seq: int, kv_len: int) -> int:
    h, inter = spec.hidden_size, spec.intermediate_size
    nh, kvh, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    return (
        _mm(seq, h, nh * hd) + 2 * _mm(seq, h, kvh * hd) + _mm(seq, nh * hd, h)
        + 2 * 2 * seq * kv_len * nh * hd
        + 2 * _mm(seq, h, inter) + _mm(seq, inter, h)
    )


def openvla_forward_flops(model_spec, prompt_len: int, batch: int = 1) -> int:
    """One predict_action: fused vision + projector + llama prefill + greedy
    decode of action_dim tokens."""
    s = model_spec
    vision = vit_flops(s.siglip, batch)
    if s.use_fused_vision:
        vision += vit_flops(s.dinov2, batch)
    n_patches = s.siglip.num_patches
    ldim = s.llama.hidden_size
    # fused backbones use a 3-linear projector; prismatic single-backbone a
    # 2-linear MLP (models/openvla/model.py init_params)
    n_sq = 2 if s.use_fused_vision else 1
    proj = batch * (
        _mm(n_patches, s.vision_dim, ldim) + n_sq * _mm(n_patches, ldim, ldim)
    )
    prefill_len = 1 + n_patches + prompt_len
    nl = s.llama.num_layers
    prefill = nl * llama_layer_flops(s.llama, prefill_len, prefill_len)
    # greedy_generate: the FIRST token comes from the prefill's last hidden
    # state; the scan then runs action_dim - 1 single-token steps. lm_head
    # is applied action_dim times total (llama.py greedy_generate).
    decode = sum(
        nl * llama_layer_flops(s.llama, 1, prefill_len + i + 1)
        for i in range(s.action_dim - 1)
    )
    lm_head = s.action_dim * _mm(1, ldim, s.llama.vocab_size)
    return vision + proj + batch * (prefill + decode + lm_head)
