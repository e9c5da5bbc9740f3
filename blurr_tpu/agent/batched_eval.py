"""Batched closed-loop evaluation: N environments stepped in lockstep with
ONE batched device program per control step.

TPU-native extension with no reference counterpart — the reference evaluates
strictly serially (src/agent/eval.py:104-306, one env, batch-1 forwards).
On a v5e the batch-1 control step is weight-bandwidth-bound
(docs/results/stage_budget_v5e.md), so stepping N episodes concurrently
amortizes the same weight traffic over N inferences: evaluation throughput
(episodes/hour) scales with N until the MXU saturates (~batch 8 measured by
benchmark_pi0 --batch-size), while per-episode semantics stay those of the
serial agent — per-env adapters keep their own state (EDR sticky gripper),
episodes reset independently with staggered episode_ids, and the summary
lines keep the collector contract.

Finished slots stay in the batch (static shapes — no recompiles) with their
outputs discarded until every requested episode has run.
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from blurr_tpu.agent.eval_agent import EvalAgent
from blurr_tpu.agent.fake_env import make_env
from blurr_tpu.config.core import instantiate

log = logging.getLogger(__name__)


class BatchedEvalAgent(EvalAgent):
    """EvalAgent with ``cfg['batch_envs']`` environments in lockstep."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.n_envs = int(cfg.get("batch_envs", 1))
        assert self.n_envs >= 1
        if self.n_video > 0:
            log.warning(
                "Video recording is not supported in batched eval; "
                "set --batch-envs 1 (serial agent) to record. Disabling."
            )
            self.n_video = 0
        if self.async_pipeline:
            log.warning(
                "--async-pipeline has no effect in batched eval (the batched "
                "step already amortizes device time over N envs); ignoring."
            )
            self.async_pipeline = False
        # slot 0 reuses the serial agent's env/adapter; the rest are fresh
        self.envs = [self.env] + [
            make_env(cfg["env"]["task"]) for _ in range(self.n_envs - 1)
        ]
        self.adapters = [self.env_adapter] + [
            instantiate(cfg["env"]["adapter"]) for _ in range(self.n_envs - 1)
        ]

        base = (
            self.model.infer_action
            if self.use_prefix_kv_cache
            else self.model.infer_action_naive
        )
        # the serial agent's jit wrapper with an N-row noise batch — one
        # key-derivation contract for both agents (EvalAgent._make_infer)
        self._infer_batched = self._make_infer(base, self.n_envs)

        # slot stacking happens IN-GRAPH: adapter.preprocess returns DEVICE
        # arrays (process_images runs on the TPU; proprio is jnp.asarray),
        # so a host-side np.concatenate would FETCH 4 arrays per slot per
        # control round across the device link — measured on the axon
        # tunnel as the batched-eval scaling anomaly (round time ~ 4N x
        # RTT: 135/517/915 ms at N=1/2/8, docs/results/
        # batched_eval_phases_v5e.csv). Concatenating inside the same jit
        # keeps the round at exactly ONE fetch (the action chunk).
        infer = self._infer_batched
        keys = ("input_ids", "attention_mask", "pixel_values", "proprios")

        import jax

        @jax.jit
        def stack_and_infer(params, slot_inputs, key, idx):
            import jax.numpy as jnp

            s = {
                k: jnp.concatenate([inp[k] for inp in slot_inputs])
                for k in keys
            }
            return infer(
                params, s["input_ids"], s["attention_mask"],
                s["pixel_values"].astype(self.dtype),
                s["proprios"].astype(self.dtype), key, idx,
            )

        self._stack_and_infer = stack_and_infer
        # per-slot host preprocessing (cv2 resize + tokenize) runs in a
        # thread pool — cv2 releases the GIL, so N slots' image work
        # overlaps instead of serializing in front of every device step
        self._pool = (
            ThreadPoolExecutor(max_workers=min(8, self.n_envs))
            if self.n_envs > 1 else None
        )

    def _batched_infer(self, slot_inputs: list) -> np.ndarray:
        """One lockstep control step from the N slots' per-slot inputs
        (list of dicts of [1, ...] arrays, stacked in-graph)."""
        out = self._stack_and_infer(
            self.params, list(slot_inputs), self._base_key, self._step_idx
        )
        self._step_idx += 1
        return self._sanitize(np.asarray(out, np.float32))

    def run(self):
        n_target = self.n_eval_episode
        log.info(
            "BatchedEvalAgent.run start: n_eval_episode=%d, batch_envs=%d, "
            "act_steps=%d",
            n_target, self.n_envs, self.act_steps,
        )
        successes = []
        infer_times = []
        env_steps_total = 0
        next_episode = 0  # next episode_id to hand to a freed slot

        class Slot:
            __slots__ = ("env", "adapter", "episode", "obs", "instruction",
                         "steps", "active", "inputs")

        slots = []
        for i in range(self.n_envs):
            s = Slot()
            s.env, s.adapter = self.envs[i], self.adapters[i]
            s.active = next_episode < n_target
            s.episode = next_episode if s.active else -1
            if s.active:
                next_episode += 1
            # inactive-from-start slots (n_eval_episode < batch_envs) still
            # need valid inputs to keep the batch shape — reset them too,
            # their outputs are simply never consumed
            obs, reset_info = s.env.reset(
                options={"obj_init_options": {"episode_id": max(s.episode, 0)}}
            )
            s.adapter.reset()
            s.obs = obs
            s.instruction = s.env.get_language_instruction()
            s.steps = 0
            s.inputs = s.adapter.preprocess(s.env, s.obs, s.instruction)
            if s.active:
                log.info(
                    "Reset info: %s Instruction: %s Max episode length: %s",
                    reset_info, s.instruction,
                    getattr(s.env.spec, "max_episode_steps", None),
                )
            slots.append(s)

        t_run = time.time()
        while any(s.active for s in slots):
            # preprocess every slot (inactive slots resend their last inputs
            # so the batch shape — and the compiled program — never changes)
            active = [s for s in slots if s.active]
            if self._pool is not None and len(active) > 1:
                for s, inp in zip(active, self._pool.map(
                    lambda s: s.adapter.preprocess(s.env, s.obs, s.instruction),
                    active,
                )):
                    s.inputs = inp
            else:
                for s in active:
                    s.inputs = s.adapter.preprocess(s.env, s.obs, s.instruction)
            t0 = time.time()
            actions = self._batched_infer(
                [s.inputs for s in slots]
            )  # [N, horizon, act_dim]
            infer_times.append(time.time() - t0)

            for i, s in enumerate(slots):
                if not s.active:
                    continue
                env_actions = s.adapter.postprocess(actions[i])
                truncated = False
                success = False
                for env_action in env_actions[: self.act_steps]:
                    s.steps += 1
                    env_steps_total += 1
                    s.obs, _, success, truncated, _ = s.env.step(env_action)
                    if truncated:
                        break
                s.instruction = s.env.get_language_instruction()
                if truncated:
                    successes.append(success)
                    log.info(
                        "Episode %d finished. success=%s, total_steps=%d",
                        s.episode, success, s.steps,
                    )
                    if next_episode < n_target:
                        s.episode = next_episode
                        next_episode += 1
                        s.obs, reset_info = s.env.reset(
                            options={
                                "obj_init_options": {"episode_id": s.episode}
                            }
                        )
                        s.adapter.reset()
                        s.instruction = s.env.get_language_instruction()
                        s.steps = 0
                        log.info(
                            "Reset info: %s Instruction: %s "
                            "Max episode length: %s",
                            reset_info, s.instruction,
                            getattr(s.env.spec, "max_episode_steps", None),
                        )
                    else:
                        s.active = False

        elapsed = time.time() - t_run
        success_rate = float(np.mean(successes)) if successes else 0.0
        # NOTE: the literal strings below are regex-matched by the result
        # collectors (collect_bridge_eval_results.py) — do not change.
        log.info("============ Evaluation Summary ============")
        log.info(f"Number of episodes: {len(successes)}")
        log.info(f"Success rate: {success_rate}")
        if len(infer_times) > 1:
            steady = sorted(infer_times[1:])
            log.info(
                "Inference wall-clock: first %.1f ms (incl. compile), "
                "steady p50 %.1f ms / mean %.1f ms over %d steps",
                infer_times[0] * 1000,
                steady[len(steady) // 2] * 1000,
                float(np.mean(steady)) * 1000,
                len(steady),
            )
        log.info(
            "Batched eval: %d envs in lockstep, %d env steps in %.1f s "
            "(%.1f env-steps/s aggregate)",
            self.n_envs, env_steps_total, elapsed,
            env_steps_total / max(elapsed, 1e-9),
        )
        log.info("============================================")
        return success_rate
