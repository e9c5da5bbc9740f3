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
