"""BLURR-TPU: a TPU-native (JAX/XLA/Pallas) inference-acceleration framework for
Vision-Language-Action models.

Re-designed from scratch for TPU hardware with the capabilities of the reference
BLURR stack (Boosted Low-Resource Inference for VLA models): Pi-0 (PaliGemma VLM +
flow-matching action expert) and autoregressive VLAs (OpenVLA family), with
per-episode instruction-prefix KV caching, BF16 compute, fused XLA/Pallas attention,
reduced-step flow rollouts, INT8 quantization, and vision-token pooling.

Capability parity target documented in SURVEY.md; reference package surface:
/root/reference/blurr/__init__.py.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("BLURR_PLATFORM"):
    # This environment pins JAX_PLATFORMS at the env level (axon tunnel);
    # BLURR_PLATFORM=cpu forces the backend through jax.config instead.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["BLURR_PLATFORM"])
    except Exception:
        pass

if _os.environ.get("BLURR_COMPILE_CACHE"):
    # Persistent XLA compilation cache (host-attached TPU deployments): the
    # first process pays the ~20-40 s compile per program shape, every later
    # process (server restarts, eval sweeps, preset ladders) loads the
    # serialized executable from disk instead. min_entry_size_bytes=0 +
    # min_compile_time_secs=0 cache everything, including the tiny warmup
    # shapes a server compiles at startup. NOTE: over this dev container's
    # axon tunnel compilation happens on the REMOTE server, so the local
    # cache cannot help here — this knob is for real deployments.
    import jax as _jax

    try:
        _jax.config.update(
            "jax_compilation_cache_dir", _os.environ["BLURR_COMPILE_CACHE"]
        )
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
