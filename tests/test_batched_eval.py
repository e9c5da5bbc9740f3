"""Batched lockstep evaluation (agent/batched_eval.py): N fake envs, one
batched device program per control step, per-episode semantics and the
collector log contract preserved."""

import logging
import re

from tests.test_eval_e2e import eval_cfg


def _mk_cfg(tmp_path, n_episodes, batch_envs, act_steps=4):
    cfg = eval_cfg(tmp_path, n_episodes=n_episodes)
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg["act_steps"] = act_steps
    cfg["batch_envs"] = batch_envs
    return cfg


def test_batched_eval_closed_loop(tmp_path, caplog):
    """3 envs in lockstep finishing 5 episodes: exact episode count, the
    collector-contract lines, and the batched-throughput summary line."""
    from blurr_tpu.agent.batched_eval import BatchedEvalAgent

    cfg = _mk_cfg(tmp_path, n_episodes=5, batch_envs=3, act_steps=2)
    with caplog.at_level(logging.INFO):
        rate = BatchedEvalAgent(cfg).run()
    assert 0.0 <= rate <= 1.0
    text = caplog.text
    m = re.search(r"Number of episodes:\s*([0-9]+)", text)
    assert m and int(m.group(1)) == 5
    assert re.search(r"Success rate:\s*([0-9.]+)", text)
    assert re.search(r"Batched eval: 3 envs in lockstep", text)
    # every episode_id 0..4 ran exactly once (staggered slot reuse)
    finished = re.findall(r"Episode (\d+) finished", text)
    assert sorted(int(e) for e in finished) == [0, 1, 2, 3, 4]


def test_batched_eval_deterministic(tmp_path, caplog):
    """Same seed, same config -> identical success rate and per-episode
    outcomes across two batched runs."""
    from blurr_tpu.agent.batched_eval import BatchedEvalAgent

    outcomes = []
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        cfg = _mk_cfg(d, n_episodes=4, batch_envs=2)
        with caplog.at_level(logging.INFO):
            rate = BatchedEvalAgent(cfg).run()
        eps = re.findall(
            r"Episode (\d+) finished\. success=(\w+)", caplog.text
        )
        outcomes.append((rate, sorted(eps)))
        caplog.clear()
    assert outcomes[0] == outcomes[1]


def test_batched_rows_match_single_inference():
    """The batched jit is row-equivalent to per-row single calls given the
    same noise (the model has no cross-batch coupling), so batched eval's
    per-episode dynamics are trustworthy."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.pi0.pizero import PiZero
    from tests.util import tiny_inputs, tiny_pi0_cfg

    model = PiZero(tiny_pi0_cfg())
    params = model.tie_action_proprio_weights(
        model.init_params(jax.random.PRNGKey(0))
    )
    inputs = tiny_inputs(model.cfg)  # batch 2
    batched = np.asarray(
        model.infer_action(
            params, inputs["input_ids"], inputs["attention_mask"],
            inputs["pixel_values"], inputs["proprios"], inputs["noise"],
        )
    )
    for i in range(2):
        row = np.asarray(
            model.infer_action(
                params,
                inputs["input_ids"][i : i + 1],
                inputs["attention_mask"][i : i + 1],
                inputs["pixel_values"][i : i + 1],
                inputs["proprios"][i : i + 1],
                inputs["noise"][i : i + 1],
            )
        )
        np.testing.assert_allclose(batched[i], row[0], rtol=2e-5, atol=2e-6)


def test_more_envs_than_episodes(tmp_path, caplog):
    """batch_envs > n_eval_episode: the surplus slots stay in the batch
    (static shapes) with their outputs discarded; accounting stays exact."""
    from blurr_tpu.agent.batched_eval import BatchedEvalAgent

    cfg = _mk_cfg(tmp_path, n_episodes=2, batch_envs=4, act_steps=2)
    with caplog.at_level(logging.INFO):
        rate = BatchedEvalAgent(cfg).run()
    assert 0.0 <= rate <= 1.0
    m = re.search(r"Number of episodes:\s*([0-9]+)", caplog.text)
    assert m and int(m.group(1)) == 2


def test_batched_eval_with_w8a8_preset(tmp_path, caplog):
    """Batched lockstep eval composes with the W8A8 quantized preset — the
    quantized tree must actually apply (no graceful-degradation warning)
    and the closed loop must finish with exact accounting."""
    from blurr_tpu.agent.batched_eval import BatchedEvalAgent

    cfg = _mk_cfg(tmp_path, n_episodes=2, batch_envs=2, act_steps=2)
    cfg["use_bf16"] = True
    cfg["vlm_quantization"] = {"mode": "w8a8", "include_vision": True}
    cfg["action_quantization"] = {"mode": "w8a8"}
    with caplog.at_level(logging.INFO):
        rate = BatchedEvalAgent(cfg).run()
    assert 0.0 <= rate <= 1.0
    assert "Quantization failed" not in caplog.text
    m = re.search(r"Number of episodes:\s*([0-9]+)", caplog.text)
    assert m and int(m.group(1)) == 2
