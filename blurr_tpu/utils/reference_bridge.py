"""Bridge to the reference torch implementation for differential parity tests.

Loads the reference's vendored torch modules (reference
third_party/open_pi_zero/src/model/...) directly — no hydra/omegaconf
installation needed; the two uninstalled imports are satisfied with minimal
shims (a dict-backed config with attribute access + ``merge``, and an
``instantiate`` that resolves ``_target_`` strings with importlib, which is
all the reference uses: pizero.py:73-77, joint_model.py:329).

Also provides weight bridges: given a reference ``Mixture`` / SigLIP tower,
produce the equivalent blurr_tpu stacked-[L, ...] parameter pytree (torch
``nn.Linear`` stores [out, in]; blurr_tpu uses [in, out], so every linear is
transposed — same convention as models/pi0/checkpoint.py).

Everything degrades gracefully: ``reference_available()`` is False when the
reference tree is absent, and callers (tests, scripts/verify_checkpoint.py
--parity) skip.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types
from typing import Optional

import numpy as np

REFERENCE_ROOT = os.environ.get(
    "BLURR_REFERENCE_ROOT", "/root/reference/third_party/open_pi_zero"
)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src", "model"))


class DotDict(dict):
    """Attribute-access dict standing in for an OmegaConf DictConfig: the
    reference config objects are read with ``cfg.key``, ``cfg.get(...)``,
    ``cfg[...]``, iteration, and ``OmegaConf.merge`` (shallow here — the
    reference merges a flat joint config with a flat mixture config)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            if isinstance(v, dict) and not isinstance(v, DotDict):
                self[k] = DotDict(v)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


class _OpenDict:
    """No-op stand-in for omegaconf.open_dict (the stub DotDict is always
    writable)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def __enter__(self):
        return self.cfg

    def __exit__(self, *exc):
        return False


def _install_stubs() -> None:
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def merge(*cfgs):
                out = DotDict()
                for c in cfgs:
                    out.update(DotDict(dict(c)))
                return out

            @staticmethod
            def create(d=None):
                return DotDict(d or {})

        om.OmegaConf = OmegaConf
        om.DictConfig = DotDict
        sys.modules["omegaconf"] = om
    om = sys.modules["omegaconf"]
    if not hasattr(om, "open_dict"):  # stub upgraded lazily; never touches a
        # real omegaconf installation (which always has open_dict)
        om.open_dict = _OpenDict

    if "hydra" not in sys.modules:
        def instantiate(cfg, *args, **kwargs):
            target = cfg["_target_"]
            module, name = target.rsplit(".", 1)
            cls = getattr(importlib.import_module(module), name)
            cfg = {k: v for k, v in dict(cfg).items() if k != "_target_"}
            cfg.update(kwargs)
            return cls(*args, **cfg)

        hy = types.ModuleType("hydra")
        hy.utils = types.SimpleNamespace(instantiate=instantiate)
        sys.modules["hydra"] = hy
        sys.modules["hydra.utils"] = hy.utils  # type: ignore[assignment]


def _install_prismatic_stub() -> None:
    """The reference's HF eval script lazily imports
    ``prismatic.vla.constants`` (eval_hf_vla_simpler.py:478) for the
    normalization-type switch. prismatic isn't installed here; this stub
    reproduces the openvla-oft constants the reference runs against
    (BOUNDS_Q99 is upstream's shipped default)."""
    if "prismatic" in sys.modules:
        return
    import enum

    class NormalizationType(str, enum.Enum):
        NORMAL = "normal"
        BOUNDS = "bounds"
        BOUNDS_Q99 = "bounds_q99"

    constants = types.ModuleType("prismatic.vla.constants")
    constants.NormalizationType = NormalizationType
    constants.ACTION_PROPRIO_NORMALIZATION_TYPE = NormalizationType.BOUNDS_Q99
    vla = types.ModuleType("prismatic.vla")
    vla.constants = constants
    prismatic = types.ModuleType("prismatic")
    prismatic.vla = vla
    sys.modules["prismatic"] = prismatic
    sys.modules["prismatic.vla"] = vla
    sys.modules["prismatic.vla.constants"] = constants


_SCRIPT_CACHE: dict = {}


def load_reference_script(name: str) -> types.ModuleType:
    """importlib-exec one of the reference's top-level ``scripts/*.py`` (e.g.
    ``eval_hf_vla_simpler``) so its module-level helpers can be driven
    differentially. The script itself puts the reference repo root on
    sys.path; prismatic/omegaconf/hydra gaps are stubbed."""
    if name in _SCRIPT_CACHE:
        return _SCRIPT_CACHE[name]
    # REFERENCE_ROOT points at third_party/open_pi_zero; scripts live two up
    path = os.path.normpath(
        os.path.join(REFERENCE_ROOT, "..", "..", "scripts", f"{name}.py")
    )
    if not os.path.isfile(path):
        raise RuntimeError(f"reference script not found: {path}")
    _install_stubs()
    _install_prismatic_stub()
    modname = "blurr_ref_script_" + name.replace("/", "_")
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    # register before exec: dataclass/typing resolution looks the module up
    # in sys.modules by name
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    demote_reference_sys_paths()
    _SCRIPT_CACHE[name] = mod
    return mod


def demote_reference_sys_paths() -> None:
    """Reference scripts insert their repo root (and its parent) at
    sys.path[0] on import, which makes the repo's OWN ``scripts`` namespace
    package resolve to the reference's scripts/ dir. Move those entries to
    the END: reference packages (blurr, src) stay importable, but the
    repo always wins name collisions."""
    ref_repo = os.path.normpath(os.path.join(REFERENCE_ROOT, "..", ".."))
    for p in (ref_repo, os.path.dirname(ref_repo)):
        while p in sys.path:
            sys.path.remove(p)
        sys.path.append(p)
    importlib.invalidate_caches()


_CACHE: Optional[types.SimpleNamespace] = None


def load_reference() -> types.SimpleNamespace:
    """Import the reference torch modules (cached). Raises if unavailable."""
    global _CACHE
    if _CACHE is not None:
        return _CACHE
    if not reference_available():
        raise RuntimeError(f"reference tree not found at {REFERENCE_ROOT}")
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    ns = types.SimpleNamespace(
        torch=importlib.import_module("torch"),
        joint_model=importlib.import_module("src.model.vla.joint_model"),
        mixture=importlib.import_module("src.model.vla.mixture"),
        vla_modules=importlib.import_module("src.model.vla.modules"),
        pizero=importlib.import_module("src.model.vla.pizero"),
        vla_processing=importlib.import_module("src.model.vla.processing"),
        kv_cache=importlib.import_module("src.model.kv_cache"),
        pg_modules=importlib.import_module("src.model.paligemma.modules"),
        siglip=importlib.import_module("src.model.paligemma.siglip"),
        gemma=importlib.import_module("src.model.paligemma.gemma"),
        quant=importlib.import_module("src.model.quantization.int8_linear"),
        geometry=importlib.import_module("src.utils.geometry"),
        model_utils=importlib.import_module("src.model.utils"),
    )
    _CACHE = ns
    return _CACHE


# ---------------------------------------------------------------------------
# torch -> numpy weight bridges (numpy keeps this importable without jax
# device state; callers wrap with jnp.asarray implicitly via pytree use)
# ---------------------------------------------------------------------------


def t2n(t) -> np.ndarray:
    return t.detach().to("cpu", copy=True).float().numpy()


def _walk(module, path: str):
    for part in path.split("."):
        module = getattr(module, part)
    return module


def stack_linear(layers, path: str) -> np.ndarray:
    """Stack one linear across layers, transposing [out,in] -> [in,out]
    (works for ANY torch module list — the reference's, or HF transformers'
    in the backbone-parity tests)."""
    return np.stack([t2n(_walk(l, path).weight).T for l in layers])


def stack_vec(layers, path: str, attr: str = "weight") -> np.ndarray:
    """Stack one vector parameter (norm scale / bias) across layers."""
    return np.stack([t2n(getattr(_walk(l, path), attr)) for l in layers])


_stack_linear = stack_linear  # internal alias


def _norm_params_from(mod, adaptive: bool) -> dict:
    """One norm module -> blurr param dict (unstacked)."""
    if adaptive:  # AdaptiveRMSNorm: to_gamma = Linear+Sigmoid, to_beta Linear
        return {
            "to_gamma_w": t2n(mod.to_gamma[0].weight).T,
            "to_gamma_b": t2n(mod.to_gamma[0].bias),
            "to_beta_w": t2n(mod.to_beta.weight).T,
        }
    return {"scale": t2n(mod.weight)}


def _stack_norms(layers, attr: str, adaptive: bool) -> dict:
    per_layer = [_norm_params_from(getattr(l, attr), adaptive) for l in layers]
    return {
        k: np.stack([p[k] for p in per_layer]) for k in per_layer[0]
    }


def bridge_mixture(ref_mixture) -> dict:
    """reference ``Mixture`` -> blurr_tpu stacked mixture param dict (the
    layout init_mixture_params produces; see models/pi0/joint.py)."""
    layers = list(ref_mixture.layers)
    adaptive = layers[0].adaptive_mode is not None
    params = {
        "q_w": _stack_linear(layers, "self_attn.q_proj"),
        "k_w": _stack_linear(layers, "self_attn.k_proj"),
        "v_w": _stack_linear(layers, "self_attn.v_proj"),
        "o_w": _stack_linear(layers, "self_attn.o_proj"),
        "gate_w": _stack_linear(layers, "mlp.gate_proj"),
        "up_w": _stack_linear(layers, "mlp.up_proj"),
        "down_w": _stack_linear(layers, "mlp.down_proj"),
        "input_norm": _stack_norms(layers, "input_layernorm", adaptive),
        "post_norm": _stack_norms(layers, "post_attention_layernorm", adaptive),
    }
    if layers[0].adaptive_mode == "adaLN-Zero":
        for name, attr in (
            ("post_scale", "post_adaptive_scale"),
            ("final_scale", "final_adaptive_scale"),
        ):
            params[name] = {
                "gamma_w": np.stack(
                    [t2n(getattr(l, attr).to_adaln_zero_gamma.weight).T for l in layers]
                ),
                "gamma_b": np.stack(
                    [t2n(getattr(l, attr).to_adaln_zero_gamma.bias) for l in layers]
                ),
            }
    if hasattr(ref_mixture, "norm"):
        params["final_norm"] = _norm_params_from(
            ref_mixture.norm, ref_mixture.adaptive_mode is not None
        )
    return params


def bridge_joint(ref_joint_model) -> dict:
    """reference ``JointModel`` -> {mixture_name: blurr mixture params}."""
    return {
        name: bridge_mixture(ref_joint_model.mixtures[name])
        for name in ref_joint_model.mixture_names
    }


_REF_TARGETS = {
    "SiglipVisionModel": "src.model.paligemma.siglip.SiglipVisionModel",
    "PaliGemmaMultiModalProjector": (
        "src.model.paligemma.siglip.PaliGemmaMultiModalProjector"
    ),
    "JointModel": "src.model.vla.joint_model.JointModel",
}


import re

_NUMERIC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _to_plain(obj):
    """Deep-convert a blurr Config / mapping tree into plain dicts.

    YAML 1.1 leaves ``1e-6``-style scalars as STRINGS (no dot before the
    exponent); the blurr side coerces at use sites, but the reference torch
    modules consume config values raw — so numeric-looking strings are
    converted here."""
    if hasattr(obj, "items"):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, str) and _NUMERIC_RE.match(obj):
        f = float(obj)
        return int(f) if f.is_integer() and "e" not in obj.lower() and "." not in obj else f
    return obj


def ref_cfg_from_blurr(cfg) -> DotDict:
    """Convert a blurr Pi-0 config (bridge.yaml schema, blurr ``_target_``s)
    into the reference PiZero's expected config: same keys, ``_target_``
    remapped to the reference's class paths, and the ``use_quantize`` /
    ``use_lora`` flags the reference modules read unconditionally
    (mixture.py:86-87,157-160) defaulted to False."""
    plain = _to_plain(cfg)
    for section in ("vision", "vision_projector", "joint"):
        tgt = plain[section]["_target_"].rsplit(".", 1)[-1]
        plain[section]["_target_"] = _REF_TARGETS[tgt]
    jc = plain["joint"]["config"]
    jc.setdefault("use_quantize", False)
    jc.setdefault("use_lora", False)
    for m in jc["mixture"].values():
        m.setdefault("use_quantize", False)
        m.setdefault("use_lora", False)
    return DotDict(plain)


def build_ref_pizero(cfg):
    """Instantiate the reference ``PiZero`` from a blurr config dict."""
    ns = load_reference()
    return ns.pizero.PiZero(ref_cfg_from_blurr(cfg)).eval()


def bridge_pizero(ref_model) -> dict:
    """reference ``PiZero`` -> the full blurr_tpu parameter pytree
    (models/pi0/pizero.py init_params layout)."""
    return {
        "embed_tokens": t2n(ref_model.embed_tokens.weight),
        "siglip": bridge_siglip(ref_model.vision_tower),
        "projector": {
            "w": t2n(ref_model.multi_modal_projector.linear.weight).T,
            "b": t2n(ref_model.multi_modal_projector.linear.bias),
        },
        "joint": bridge_joint(ref_model.joint_model),
        "action_encoder": {
            "w1": t2n(ref_model.action_encoder.linear_1.weight).T,
            "b1": t2n(ref_model.action_encoder.linear_1.bias),
            "w2": t2n(ref_model.action_encoder.linear_2.weight).T,
            "b2": t2n(ref_model.action_encoder.linear_2.bias),
            "w3": t2n(ref_model.action_encoder.linear_3.weight).T,
            "b3": t2n(ref_model.action_encoder.linear_3.bias),
        },
        "proprio_encoder": {
            "w": t2n(ref_model.proprio_encoder.weight).T,
            "b": t2n(ref_model.proprio_encoder.bias),
        },
        "action_decoder": {
            "w": t2n(ref_model.action_decoder.weight).T,
            "b": t2n(ref_model.action_decoder.bias),
        },
    }


def bridge_siglip(ref_vision_model) -> dict:
    """reference ``SiglipVisionModel`` -> blurr siglip param pytree
    (models/pi0/siglip.py layout: conv-as-matmul patch embed with (pi, pj, c)
    flat ordering, layer-stacked encoder)."""
    vt = ref_vision_model.vision_model
    emb = vt.embeddings
    conv_w = t2n(emb.patch_embedding.weight)  # [D, C, p, p]
    d = conv_w.shape[0]
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)  # (pi, pj, c) -> D
    layers = list(vt.encoder.layers)

    def stack_lin(path):
        return _stack_linear(layers, path)

    def stack_vec(path, attr):
        out = []
        for layer in layers:
            mod = layer
            for part in path.split("."):
                mod = getattr(mod, part)
            out.append(t2n(getattr(mod, attr)))
        return np.stack(out)

    return {
        "patch_w": patch_w,
        "patch_b": t2n(emb.patch_embedding.bias),
        "pos_embed": t2n(emb.position_embedding.weight),
        "layers": {
            "ln1_w": stack_vec("layer_norm1", "weight"),
            "ln1_b": stack_vec("layer_norm1", "bias"),
            "ln2_w": stack_vec("layer_norm2", "weight"),
            "ln2_b": stack_vec("layer_norm2", "bias"),
            "q_w": stack_lin("self_attn.q_proj"),
            "q_b": stack_vec("self_attn.q_proj", "bias"),
            "k_w": stack_lin("self_attn.k_proj"),
            "k_b": stack_vec("self_attn.k_proj", "bias"),
            "v_w": stack_lin("self_attn.v_proj"),
            "v_b": stack_vec("self_attn.v_proj", "bias"),
            "out_w": stack_lin("self_attn.out_proj"),
            "out_b": stack_vec("self_attn.out_proj", "bias"),
            "fc1_w": stack_lin("mlp.fc1"),
            "fc1_b": stack_vec("mlp.fc1", "bias"),
            "fc2_w": stack_lin("mlp.fc2"),
            "fc2_b": stack_vec("mlp.fc2", "bias"),
        },
        "post_ln_w": t2n(vt.post_layernorm.weight),
        "post_ln_b": t2n(vt.post_layernorm.bias),
    }
