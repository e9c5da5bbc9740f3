"""Closed-loop SimplerEnv evaluation agent (parity surface: reference
src/agent/eval.py).

TPU execution model: the whole control step — embed merge, SigLIP, prefill,
flow scan, clip — is ONE jitted device program. The only host<->device
traffic per control step is the (image, tokens, proprio, noise) upload and a
[horizon, action_dim] action-chunk download; masks are built in-graph. The
torch.compile / SDPA / TF32 toggles of the reference map to jax.jit + XLA
defaults (`use_torch_compile` is accepted for CLI parity and simply selects
jit, which is always used).
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import blurr_tpu.agent.env_adapter.simpler  # noqa: F401  (registers adapters)
from blurr_tpu.agent.fake_env import make_env
from blurr_tpu.config.core import instantiate
from blurr_tpu.models.pi0.pizero import PiZeroInference
from blurr_tpu.utils.monitor import log_allocated_tpu_memory, log_execution_time

try:
    import imageio
except Exception:  # pragma: no cover
    imageio = None

log = logging.getLogger(__name__)


def make_noise_infer(fn, n_tok: int, act_dim: int, dtype):
    """Jitted control step with IN-GRAPH flow noise from
    ``fold_in(base_key, step_idx)``: sampling on the host would dispatch
    two extra device programs per control step (split + normal), which
    costs real round-trips on the axon tunnel. This is the ONE noise/key
    derivation (CLAUDE.md) shared by the serial agent, batched lockstep
    eval, the Pi-0 action server, and the open-loop evaluator; the noise
    batch follows ``ids.shape[0]``."""

    def step(params, ids, am, px, pr, key, idx):
        noise = jax.random.normal(
            jax.random.fold_in(key, idx),
            (ids.shape[0], n_tok, act_dim), dtype,
        )
        return fn(params, ids, am, px, pr, noise)

    return jax.jit(step)


class EvalAgent:
    def __init__(self, cfg):
        log.info("EvalAgent.__init__ start, task=%s", cfg["env"].get("task"))
        self.cfg = cfg
        self.n_eval_episode = cfg["n_eval_episode"]
        self.n_video = cfg["n_video"]
        self.log_dir = cfg["log_dir"]
        self.video_dir = os.path.join(self.log_dir, "videos")
        os.makedirs(self.video_dir, exist_ok=True)

        use_bf16 = bool(cfg.get("use_bf16", False))
        use_fp16 = bool(cfg.get("use_fp16", False))
        if use_bf16 and use_fp16:
            raise ValueError("Specify at most one of `use_bf16` or `use_fp16`.")
        if use_fp16:
            log.warning("FP16 requested; TPUs prefer BF16 — using bfloat16.")
            self.dtype = jnp.bfloat16
        elif use_bf16:
            self.dtype = jnp.bfloat16
        else:
            self.dtype = jnp.float32

        log.info("Initializing PiZeroInference (this may take some time)...")
        t0 = time.time()
        self.model = PiZeroInference(cfg)
        log.info("PiZeroInference initialized in %.2f s", time.time() - t0)
        self.params = self.load_checkpoint(cfg.get("checkpoint_path"))
        try:
            # apply atomically: a failure between the two enables must not
            # leave a half-quantized tree attributed to the quantized preset
            quantized = self.model.enable_action_quantization(self.params)
            quantized = self.model.enable_vlm_quantization(quantized)
            self.params = quantized
        except Exception as exc:  # graceful like the reference (eval.py:74-78)
            log.warning(
                "Quantization failed, continuing with UNQUANTIZED weights "
                "(results do not reflect the quantized preset): %s", exc
            )
        # jit boundary (the reference's torch.compile(mode="reduce-overhead")).
        self._infer_cached = self._make_infer(self.model.infer_action, 1)
        self._infer_naive = self._make_infer(self.model.infer_action_naive, 1)
        log.info("Using device: %s dtype: %s", jax.devices()[0], self.dtype)
        log_allocated_tpu_memory(log, "loading model")

        self.act_steps = cfg["act_steps"]
        self.use_prefix_kv_cache = bool(cfg.get("use_prefix_kv_cache", True))
        # Async pipelined control (SURVEY §7.5 #6: hide TPU dispatch behind
        # env stepping): inference for the NEXT chunk is dispatched after the
        # first sub-step of the current chunk and fetched after the last, so
        # the device computes while the sim steps. Executed actions are stale
        # by act_steps-1 env steps (fresh actions still arrive every
        # act_steps). Opt-in; needs act_steps >= 2 to have anything to hide.
        self.async_pipeline = bool(cfg.get("async_pipeline", False))
        if self.async_pipeline and self.act_steps < 2:
            log.warning("async_pipeline needs act_steps >= 2; disabled.")
            self.async_pipeline = False
        self._base_key = jax.random.PRNGKey(int(cfg.get("seed", 42)))
        self._step_idx = 0
        # --record-dataset: stash every (model-ready inputs, predicted
        # chunk) pair and write a blurr_tpu.data sharded dataset at the
        # end of the run — the in-repo collect->train->validate loop
        self.record_dir = str(cfg.get("record_dataset_dir") or "") or None
        self._recorded: list = []

        log.info("Creating SimplerEnv env with task='%s'...", cfg["env"]["task"])
        t0 = time.time()
        self.env = make_env(cfg["env"]["task"])
        log.info("Env created in %.2f s", time.time() - t0)

        log.info("Instantiating env adapter: %s", cfg["env"]["adapter"]["_target_"])
        self.env_adapter = instantiate(cfg["env"]["adapter"])
        log.info("Env adapter instantiated.")

    def _make_infer(self, fn, batch_size: int):
        """Jitted control step with in-graph noise; the derivation lives in
        module-level :func:`make_noise_infer` (the single key-derivation
        contract for the serial agent, batched lockstep eval, the Pi-0
        action server, and the open-loop evaluator). ``batch_size``
        documents the caller's batch; the noise batch follows
        ``ids.shape[0]``, which equals it by construction."""
        del batch_size
        return make_noise_infer(
            fn, self.model.spec.num_action_tokens,
            self.model.spec.action_dim, self.dtype,
        )

    @staticmethod
    def _sanitize(out: np.ndarray) -> np.ndarray:
        """Non-finite action guard shared by the serial and batched fetch
        paths (reference eval_hf_vla_simpler.py:968-975 semantics)."""
        if not np.isfinite(out).all():
            log.warning("Non-finite actions (nan/inf) replaced with zeros.")
            out = np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)
        return out

    @log_execution_time(log)
    def load_checkpoint(self, path):
        """Torch .pt checkpoint via the checkpoint bridge; empty/'random'
        gives deterministic random-init weights (smoke/latency mode)."""
        if not path or str(path).lower() in {"random", "none"}:
            log.warning("No checkpoint: using random-init weights.")
            params = self.model.init_params(jax.random.PRNGKey(0), dtype=self.dtype)
            return self.model.tie_action_proprio_weights(params)
        from blurr_tpu.models.pi0.checkpoint import load_pizero_params_auto

        # torch .pt OR an orbax dir from train_pi0_flow --save-dir
        params = load_pizero_params_auto(path, dtype=self.dtype)
        log.info("Loaded model from %s", path)
        return params

    def _open_video_writer(self, stem: str):
        """Writer for ``stem`` + '.mp4', degrading to an animated GIF (the
        Pillow backend is always available) and then to disabled when imageio
        lacks an ffmpeg backend. Returns (writer, actual_path) or (None, None)."""
        if imageio is None:
            log.warning("imageio not installed; video recording disabled.")
            return None, None
        try:
            return imageio.get_writer(stem + ".mp4"), stem + ".mp4"
        except Exception as exc:  # no ffmpeg backend etc.
            try:
                w = imageio.get_writer(stem + ".gif", duration=0.2, loop=0)
                log.warning(
                    "mp4 backend unavailable (%s); recording GIF instead.", exc
                )
                return w, stem + ".gif"
            except Exception as exc2:
                log.warning("Video recording disabled (%s).", exc2)
                return None, None

    def _dispatch(self, inputs: dict):
        """Launch the control-step device program WITHOUT fetching: JAX
        dispatch is asynchronous, so the host returns immediately and the
        TPU computes in the background (the async-pipeline mode overlaps
        this with env stepping)."""
        fn = self._infer_cached if self.use_prefix_kv_cache else self._infer_naive
        actions = fn(
            self.params,
            inputs["input_ids"],
            inputs["attention_mask"],
            inputs["pixel_values"].astype(self.dtype),
            inputs["proprios"].astype(self.dtype),
            self._base_key,
            self._step_idx,
        )
        self._step_idx += 1
        return actions

    def _fetch(self, pending) -> np.ndarray:
        return self._sanitize(np.asarray(pending[0], np.float32))

    def _infer(self, inputs: dict) -> np.ndarray:
        return self._fetch(self._dispatch(inputs))

    def _record_example(self, inputs: dict, actions: np.ndarray) -> None:
        """One (model-ready inputs, predicted normalized chunk) pair for
        --record-dataset. Model-ready keys pass straight through the
        training loader (no Pi0TrainTransform), so a recorded rollout
        trains with ``train_pi0_flow --data <dir>`` and scores with
        ``eval_openloop.py`` unchanged. Actions are the POLICY's own
        outputs (DAgger-style rollout collection); swap in teleop labels
        for real demonstrations."""
        if self.record_dir is None:
            return
        self._recorded.append({
            "input_ids": np.asarray(inputs["input_ids"], np.int32)[0],
            "attention_mask": np.asarray(
                inputs["attention_mask"], np.int32)[0],
            "pixel_values": np.asarray(inputs["pixel_values"], np.float32)[0],
            "proprios": np.asarray(inputs["proprios"], np.float32)[0],
            "actions": np.asarray(actions, np.float32),
        })

    def run(self):
        log.info(
            "EvalAgent.run start: n_eval_episode=%d, n_video=%d, act_steps=%d",
            self.n_eval_episode,
            self.n_video,
            self.act_steps,
        )
        env = self.env
        env_adapter = self.env_adapter
        cnt_episode = 0
        successes = []
        infer_times = []

        env_reset_options = {"obj_init_options": {"episode_id": cnt_episode}}
        obs, reset_info = env.reset(options=env_reset_options)
        env_adapter.reset()
        instruction = env.get_language_instruction()
        recording = self.n_video > 0
        video_writer = None

        def video_parent_path(x):
            return os.path.join(self.video_dir, f"video_{x}")

        video_path = None
        if recording:
            video_writer, video_path = self._open_video_writer(
                video_parent_path(cnt_episode)
            )
            recording = video_writer is not None
        log.info(
            "Reset info: %s Instruction: %s Max episode length: %s",
            reset_info,
            instruction,
            getattr(env.spec, "max_episode_steps", None),
        )
        step_in_episode = 0
        next_chunk = None  # async pipeline: prefetched chunk for next step
        fetch_waits = []
        while True:
            if next_chunk is None:
                inputs = env_adapter.preprocess(env, obs, instruction)
                t0 = time.time()
                actions = self._infer(inputs)
                infer_times.append(time.time() - t0)
                self._record_example(inputs, actions)
                log.debug(
                    "Episode %d, step %d: model forward done in %.3f s.",
                    cnt_episode,
                    step_in_episode,
                    infer_times[-1],
                )
            else:
                actions = next_chunk
                next_chunk = None
            env_actions = env_adapter.postprocess(actions)

            truncated = False
            success = False
            pending = None
            for i, env_action in enumerate(env_actions[: self.act_steps]):
                step_in_episode += 1
                if step_in_episode % 10 == 0:
                    log.info(
                        "Episode %d, env step %d: stepping env...",
                        cnt_episode,
                        step_in_episode,
                    )
                obs, reward, success, truncated, info = env.step(env_action)
                if truncated:
                    break
                if self.async_pipeline and i == 0:
                    # dispatch the NEXT chunk from the post-first-sub-step
                    # obs; the TPU computes while the remaining act_steps-1
                    # sub-steps run (actions land act_steps-1 steps stale).
                    # Refresh the instruction FIRST (cheap) so a mid-episode
                    # instruction switch conditions the prefetched chunk —
                    # without this, long-horizon switching tasks would run
                    # one extra chunk on the stale instruction
                    instruction = env.get_language_instruction()
                    inputs = env_adapter.preprocess(env, obs, instruction)
                    pending = self._dispatch(inputs)
            if pending is not None and not truncated:
                t_wait = time.time()
                next_chunk = self._fetch(pending)
                fetch_waits.append(time.time() - t_wait)
                # `inputs` still refers to the tensors this chunk was
                # dispatched from (the async prefetch pairing)
                self._record_example(inputs, next_chunk)

            if recording and video_writer is not None:
                video_writer.append_data(env_adapter.get_video_frame(env, obs))

            new_instruction = env.get_language_instruction()
            if new_instruction != instruction:
                instruction = new_instruction

            if truncated:
                successes.append(success)
                log.info(
                    "Episode %d finished. success=%s, total_steps=%d",
                    cnt_episode,
                    success,
                    step_in_episode,
                )
                if recording and video_writer is not None:
                    video_writer.close()
                    if success and video_path is not None:
                        stem, ext = os.path.splitext(video_path)
                        os.rename(video_path, stem + "_success" + ext)
                cnt_episode += 1
                step_in_episode = 0
                next_chunk = None  # fresh episode must infer from new obs
                if cnt_episode >= self.n_eval_episode:
                    break
                env_reset_options["obj_init_options"] = {"episode_id": cnt_episode}
                obs, reset_info = env.reset(options=env_reset_options)
                env_adapter.reset()
                instruction = env.get_language_instruction()
                log.info(
                    f"Reset info: {reset_info} Instruction: {instruction} "
                    f"Max episode length: "
                    f"{getattr(env.spec, 'max_episode_steps', None)}"
                )
                recording = self.n_video > cnt_episode
                if recording:
                    video_writer, video_path = self._open_video_writer(
                        video_parent_path(cnt_episode)
                    )
                    recording = video_writer is not None

        success_rate = float(np.mean(successes)) if successes else 0.0
        # NOTE: the literal strings below are regex-matched by the result
        # collectors (collect_bridge_eval_results.py) — do not change.
        log.info("============ Evaluation Summary ============")
        log.info(f"Number of episodes: {cnt_episode}")
        log.info(f"Success rate: {success_rate}")
        if len(infer_times) > 1:
            # first call includes XLA compilation; report it separately
            steady = sorted(infer_times[1:])
            log.info(
                "Inference wall-clock: first %.1f ms (incl. compile), "
                "steady p50 %.1f ms / mean %.1f ms over %d steps",
                infer_times[0] * 1000,
                steady[len(steady) // 2] * 1000,
                float(np.mean(steady)) * 1000,
                len(steady),
            )
        if fetch_waits:
            w = sorted(fetch_waits)
            log.info(
                "Async pipeline: residual fetch wait p50 %.1f ms / mean "
                "%.1f ms over %d prefetched chunks (device time hidden "
                "behind env stepping)",
                w[len(w) // 2] * 1000,
                float(np.mean(w)) * 1000,
                len(w),
            )
        if self.record_dir and self._recorded:
            from blurr_tpu.data import write_dataset

            arrays = {
                k: np.stack([r[k] for r in self._recorded])
                for k in self._recorded[0]
            }
            write_dataset(self.record_dir, arrays, shard_size=256)
            log.info("Recorded %d control-step examples to %s",
                     len(self._recorded), self.record_dir)
        log.info("============================================")
        return success_rate
