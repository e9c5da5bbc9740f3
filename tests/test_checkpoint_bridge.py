"""Torch->JAX checkpoint bridge: key mapping, transposition semantics, and a
full bridged forward on a synthetic reference-format .pt checkpoint."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from blurr_tpu.models.pi0.checkpoint import pizero_params_from_torch_checkpoint
from blurr_tpu.models.pi0.pizero import PiZero
from tests.util import tiny_inputs, tiny_pi0_cfg


def synth_torch_state(cfg, seed=0):
    """Build a state dict with the reference PiZero key names/shapes
    (reference pizero.py module structure) for the tiny config."""
    rng = np.random.RandomState(seed)
    t = lambda *shape: torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)
    jc = cfg.joint.config
    L, NH, KVH, D = (
        jc.num_hidden_layers,
        jc.num_attention_heads,
        jc.num_key_value_heads,
        jc.head_dim,
    )
    vc = cfg.vision.config
    state = {
        "embed_tokens.weight": t(cfg.vocab_size, cfg.mixture.vlm.hidden_size),
        "multi_modal_projector.linear.weight": t(
            cfg.vision_projector.config.vision_config.projection_dim,
            vc.hidden_size,
        ),
        "multi_modal_projector.linear.bias": t(
            cfg.vision_projector.config.vision_config.projection_dim
        ),
        "proprio_encoder.weight": t(cfg.mixture.proprio.hidden_size, cfg.proprio_dim),
        "proprio_encoder.bias": t(cfg.mixture.proprio.hidden_size),
        "action_decoder.weight": t(cfg.action_dim, cfg.mixture.action.hidden_size),
        "action_decoder.bias": t(cfg.action_dim),
    }
    aw = cfg.mixture.action.hidden_size
    for i, (name, shape) in enumerate(
        [("linear_1", (aw, cfg.action_dim)), ("linear_2", (aw, 2 * aw)),
         ("linear_3", (aw, aw))]
    ):
        state[f"action_encoder.{name}.weight"] = t(*shape)
        state[f"action_encoder.{name}.bias"] = t(shape[0])

    # vision tower (reference SiglipVisionModel layout)
    vp = "vision_tower.vision_model."
    d, inter, p = vc.hidden_size, vc.intermediate_size, vc.patch_size
    state[vp + "embeddings.patch_embedding.weight"] = t(d, 3, p, p)
    state[vp + "embeddings.patch_embedding.bias"] = t(d)
    n_pos = (vc.image_size // p) ** 2
    state[vp + "embeddings.position_embedding.weight"] = t(n_pos, d)
    for i in range(vc.num_hidden_layers):
        lp = vp + f"encoder.layers.{i}."
        for nm, shape in [
            ("layer_norm1.weight", (d,)), ("layer_norm1.bias", (d,)),
            ("layer_norm2.weight", (d,)), ("layer_norm2.bias", (d,)),
            ("self_attn.q_proj.weight", (d, d)), ("self_attn.q_proj.bias", (d,)),
            ("self_attn.k_proj.weight", (d, d)), ("self_attn.k_proj.bias", (d,)),
            ("self_attn.v_proj.weight", (d, d)), ("self_attn.v_proj.bias", (d,)),
            ("self_attn.out_proj.weight", (d, d)), ("self_attn.out_proj.bias", (d,)),
            ("mlp.fc1.weight", (inter, d)), ("mlp.fc1.bias", (inter,)),
            ("mlp.fc2.weight", (d, inter)), ("mlp.fc2.bias", (d,)),
        ]:
            state[lp + nm] = t(*shape)
    state[vp + "post_layernorm.weight"] = t(d)
    state[vp + "post_layernorm.bias"] = t(d)

    # joint mixtures (Gemma decoder-layer layout)
    for mix in ("vlm", "proprio", "action"):
        h = cfg.mixture[mix].hidden_size
        inter = cfg.mixture[mix].intermediate_size
        mp = f"joint_model.mixtures.{mix}."
        for i in range(L):
            lp = mp + f"layers.{i}."
            state[lp + "self_attn.q_proj.weight"] = t(NH * D, h)
            state[lp + "self_attn.k_proj.weight"] = t(KVH * D, h)
            state[lp + "self_attn.v_proj.weight"] = t(KVH * D, h)
            state[lp + "self_attn.o_proj.weight"] = t(h, NH * D)
            state[lp + "mlp.gate_proj.weight"] = t(inter, h)
            state[lp + "mlp.up_proj.weight"] = t(inter, h)
            state[lp + "mlp.down_proj.weight"] = t(h, inter)
            state[lp + "input_layernorm.weight"] = t(h)
            state[lp + "post_attention_layernorm.weight"] = t(h)
        if cfg.mixture[mix].use_final_norm:
            state[mp + "norm.weight"] = t(h)
    return state


@pytest.fixture(scope="module")
def bridged(tmp_path_factory):
    cfg = tiny_pi0_cfg()
    state = synth_torch_state(cfg)
    path = tmp_path_factory.mktemp("ckpt") / "model.pt"
    # include the _orig_mod. prefix the reference strips (eval.py:312-314)
    torch.save({"model": {f"_orig_mod.{k}": v for k, v in state.items()}}, path)
    params = pizero_params_from_torch_checkpoint(str(path), dtype=jnp.float32)
    return cfg, state, params


def test_linear_transposition_semantics(bridged):
    """torch F.linear(x, W) must equal x @ params_w for bridged weights."""
    cfg, state, params = bridged
    x = torch.randn(3, cfg.proprio_dim)
    ref = torch.nn.functional.linear(
        x, state["proprio_encoder.weight"], state["proprio_encoder.bias"]
    ).numpy()
    ours = np.asarray(
        jnp.asarray(x.numpy()) @ params["proprio_encoder"]["w"]
        + params["proprio_encoder"]["b"]
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_conv_patch_embed_semantics(bridged):
    """Conv2d(patch, stride=patch) == patchify + matmul with bridged weight."""
    cfg, state, params = bridged
    vc = cfg.vision.config
    img = torch.randn(1, 3, vc.image_size, vc.image_size)
    conv = torch.nn.functional.conv2d(
        img,
        state["vision_tower.vision_model.embeddings.patch_embedding.weight"],
        state["vision_tower.vision_model.embeddings.patch_embedding.bias"],
        stride=vc.patch_size,
    )
    ref = conv.flatten(2).transpose(1, 2).numpy()  # [B, N, D]

    from blurr_tpu.models.pi0.siglip import patchify

    patches = patchify(jnp.asarray(img.numpy()), vc.patch_size)
    ours = np.asarray(
        patches @ params["siglip"]["patch_w"] + params["siglip"]["patch_b"]
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_stacked_layer_order(bridged):
    cfg, state, params = bridged
    for i in range(cfg.joint.config.num_hidden_layers):
        np.testing.assert_allclose(
            np.asarray(params["joint"]["vlm"]["q_w"][i]),
            state[f"joint_model.mixtures.vlm.layers.{i}.self_attn.q_proj.weight"]
            .numpy()
            .T,
        )


def test_bridged_forward_runs(bridged):
    cfg, _, params = bridged
    model = PiZero(cfg)
    inputs = tiny_inputs(cfg)
    actions = np.asarray(model.infer_action(params, **inputs))
    assert actions.shape == (2, 4, 7)
    assert np.isfinite(actions).all()


def test_orbax_save_restore_roundtrip(tmp_path):
    import jax

    from blurr_tpu.models.pi0.checkpoint import restore_params, save_params

    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    path = tmp_path / "ckpt"
    save_params(params, str(path))
    restored = restore_params(str(path), like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adaptive_checkpoint_bridge(tmp_path):
    """adaLN-Zero action/proprio mixtures load from the reference torch key
    layout (input_layernorm.to_gamma.0.*, *_adaptive_scale.to_adaln_zero_*,
    norm.to_gamma.0.* final norm) and the bridged model runs infer_action."""
    mode = "adaLN-Zero"
    cfg = tiny_pi0_cfg()
    cfg.action_expert_adaptive_mode = mode
    for mix in ("proprio", "action"):
        cfg.mixture[mix].adaptive_mode = mode
    cfg.joint.config.mixture = cfg.mixture
    cfg.joint.config.action_expert_adaptive_mode = mode
    model = PiZero(cfg)
    tc = model.joint_spec.time_hidden_size

    rng = np.random.RandomState(7)
    t = lambda *shape: torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)
    state = synth_torch_state(cfg)
    # replace the plain norms of proprio/action with adaptive layouts
    jc = cfg.joint.config
    for mix in ("proprio", "action"):
        h = cfg.mixture[mix].hidden_size
        mp = f"joint_model.mixtures.{mix}."
        for i in range(jc.num_hidden_layers):
            lp = mp + f"layers.{i}."
            for nm in ("input_layernorm", "post_attention_layernorm"):
                del state[lp + nm + ".weight"]
                state[lp + nm + ".to_gamma.0.weight"] = t(h, tc)
                state[lp + nm + ".to_gamma.0.bias"] = t(h)
                state[lp + nm + ".to_beta.weight"] = t(h, tc)
            for nm in ("post_adaptive_scale", "final_adaptive_scale"):
                state[lp + nm + ".to_adaln_zero_gamma.weight"] = t(h, tc)
                state[lp + nm + ".to_adaln_zero_gamma.bias"] = t(h)
        if cfg.mixture[mix].use_final_norm:
            state.pop(mp + "norm.weight", None)
            state[mp + "norm.to_gamma.0.weight"] = t(h, tc)
            state[mp + "norm.to_gamma.0.bias"] = t(h)
            state[mp + "norm.to_beta.weight"] = t(h, tc)
    # adaptive mode: action encoder has no time concat (square linear_2)
    aw = cfg.mixture.action.hidden_size
    state["action_encoder.linear_2.weight"] = t(aw, aw)

    path = tmp_path / "adaptive.pt"
    torch.save({"model": state}, path)
    params = pizero_params_from_torch_checkpoint(str(path), dtype=jnp.float32)

    an = params["joint"]["action"]
    assert "to_gamma_w" in an["input_norm"], "adaptive layer norms bridged"
    assert "post_scale" in an and "final_scale" in an
    assert "final_norm" in an and "to_gamma_w" in an["final_norm"], (
        "adaptive FINAL norm must bridge (engine calls adaptive_rms_norm on it)"
    )

    inputs = tiny_inputs(cfg)
    out = np.asarray(model.infer_action(params, **inputs))
    assert out.shape == (2, 4, 7)
    assert np.isfinite(out).all()


class TestTorchExport:
    """JAX -> torch export (save_torch_checkpoint): the inverse bridge."""

    def test_roundtrip_bitwise(self, tmp_path):
        """export -> re-import is the identity on an fp32 tree (transposes
        and the conv/patch permutation are exact inverses)."""
        import jax

        from blurr_tpu.models.pi0.checkpoint import save_torch_checkpoint

        cfg = tiny_pi0_cfg()
        model = PiZero(cfg)
        params = model.init_params(jax.random.PRNGKey(0), jnp.float32)
        params = model.tie_action_proprio_weights(params)
        path = tmp_path / "export.pt"
        save_torch_checkpoint(params, str(path))
        back = pizero_params_from_torch_checkpoint(str(path), dtype=jnp.float32)
        flat_a, tree_a = jax.tree.flatten(params)
        flat_b, tree_b = jax.tree.flatten(back)
        assert tree_a == tree_b
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_canonical_tree_duplicates_tied_mixture(self, tmp_path):
        """A training-canonical tree (tied proprio -> None) exports the
        action weights under BOTH mixture prefixes — the layout a torch
        state_dict with shared Parameters produces."""
        import jax

        from blurr_tpu.models.pi0.checkpoint import (
            save_torch_checkpoint,
            torch_state_dict_from_pizero_params,
        )

        cfg = tiny_pi0_cfg()
        model = PiZero(cfg)
        params = model.init_params(jax.random.PRNGKey(0), jnp.float32)
        params = model.tie_action_proprio_weights(params)
        canon = model.canonicalize_tied_weights(params)
        sd = torch_state_dict_from_pizero_params(canon)
        np.testing.assert_array_equal(
            sd["joint_model.mixtures.proprio.layers.0.self_attn.q_proj.weight"],
            sd["joint_model.mixtures.action.layers.0.self_attn.q_proj.weight"],
        )
        # and the re-imported tied tree equals the original aliased one
        path = tmp_path / "canon.pt"
        save_torch_checkpoint(canon, str(path))
        back = pizero_params_from_torch_checkpoint(str(path), dtype=jnp.float32)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_exported_keys_match_reference_layout(self):
        """The exported key set is EXACTLY the synthetic reference-format
        state dict's key set (same fixture the import tests load)."""
        import jax

        from blurr_tpu.models.pi0.checkpoint import (
            torch_state_dict_from_pizero_params,
        )

        cfg = tiny_pi0_cfg()
        model = PiZero(cfg)
        params = model.init_params(jax.random.PRNGKey(1), jnp.float32)
        params = model.tie_action_proprio_weights(params)
        sd = torch_state_dict_from_pizero_params(params)
        ref_keys = set(synth_torch_state(cfg))
        assert set(sd) == ref_keys
        for k, v in sd.items():
            assert v.shape == tuple(synth_torch_state(cfg)[k].shape), k


def test_train_checkpoint_manager_retention_and_restore(tmp_path):
    """TrainCheckpointManager: step-numbered async saves, max_to_keep
    retention, latest-step discovery, and restore equality with the
    save_train_state tree contract."""
    import os

    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.pi0.checkpoint import (
        TrainCheckpointManager,
        is_manager_root,
        save_train_state,
    )

    def state(i):
        params = {"w": jnp.full((4, 4), float(i)), "b": jnp.arange(3.0) * i}
        opt = {"mu": jax.tree.map(jnp.zeros_like, params), "count": jnp.asarray(i)}
        return params, opt, jax.random.PRNGKey(i)

    root = tmp_path / "mgr"
    mgr = TrainCheckpointManager(str(root), keep=2)
    for i in (2, 4, 6):
        p, o, r = state(i)
        mgr.save(i, p, o, r)
    assert mgr.latest_step() == 6
    like_p, like_o, like_r = state(0)
    rp, ro, step, rr = mgr.restore(like_p, like_o, like_r)
    assert step == 6
    np.testing.assert_array_equal(np.asarray(rp["w"]), np.full((4, 4), 6.0))
    np.testing.assert_array_equal(np.asarray(rr), np.asarray(state(6)[2]))
    # restore an explicitly retained older step too
    _, _, step4, _ = mgr.restore(like_p, like_o, like_r, step=4)
    assert step4 == 4
    mgr.close()
    # retention: only the 2 newest steps remain on disk
    kept = sorted(int(e) for e in os.listdir(root) if e.isdigit())
    assert kept == [4, 6]
    # dispatch helper: manager root vs plain save_train_state tree
    assert is_manager_root(str(root))
    flat = tmp_path / "flat_state"
    p, o, r = state(1)
    save_train_state(str(flat), p, o, 1, r)
    assert not is_manager_root(str(flat))
    assert not is_manager_root(str(tmp_path / "nope"))
