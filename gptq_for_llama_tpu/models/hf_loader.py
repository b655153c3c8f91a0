"""HuggingFace checkpoint loading: safetensors/torch .bin -> parameter pytree.

Replaces the reference's AutoModelForCausalLM.from_pretrained + skeleton-init dance
(reference: llama.py:13-24, 279-325). Weights are read directly from disk into
numpy and mapped to the functional param layout (linear kernels transposed to
(in, out)). Also handles packed GPTQ checkpoints: any linear whose ``<name>.qweight``
key is present becomes a PackedLinear (the reference reconstructs QuantLinear
skeletons then load_state_dict's into them, llama.py:279-310).
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig, config_from_hf
from ..ops.linear import PackedLinear, dense


def read_flat_state(model_path: str) -> dict:
    """Read every tensor from a HF checkpoint dir into {name: numpy array}."""
    flat = {}
    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            try:
                flat.update(load_file(f))
            except Exception:
                # fp16/bf16 saved from torch may need the torch loader
                from safetensors import safe_open
                with safe_open(f, framework="np") as sf:
                    for k in sf.keys():
                        flat[k] = sf.get_tensor(k)
        return flat
    bin_files = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin")))
    if bin_files:
        import torch
        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for k, v in sd.items():
                flat[k] = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        return flat
    raise FileNotFoundError(f"No safetensors or pytorch_model*.bin in {model_path}")


def _to_dtype(a, dtype):
    a = np.asarray(a)
    if a.dtype == np.dtype("V2"):  # raw bf16 from safetensors numpy
        a = a.view(np.uint16).astype(np.uint32) << 16
        a = a.view(np.float32) if a.dtype == np.uint32 else a
    return jnp.asarray(a, dtype=dtype)


class _Mapper:
    """Pulls tensors from the flat dict, building dense or packed linears."""

    def __init__(self, flat: dict, dtype, default_bits: int = 4):
        self.flat = flat
        self.dtype = dtype
        self.default_bits = default_bits
        self.meta_bits = {}  # per-linear bits, from checkpoint metadata if present

    def tensor(self, key, dtype=None):
        return _to_dtype(self.flat[key], dtype or self.dtype)

    def has(self, key):
        return key in self.flat

    def norm(self, prefix):
        w = self.tensor(f"{prefix}.weight")
        if f"{prefix}.bias" in self.flat:
            return {"w": w, "b": self.tensor(f"{prefix}.bias")}
        return w

    def linear(self, prefix):
        """Dense (weight (out,in) -> kernel (in,out)) or packed GPTQ linear."""
        if f"{prefix}.qweight" in self.flat:
            # bias/scales go through _to_dtype like dense tensors (raw-bf16
            # "V2" safetensors would otherwise fail the numpy float cast)
            bias = (self.tensor(f"{prefix}.bias")
                    if f"{prefix}.bias" in self.flat else None)
            scales = np.asarray(self.tensor(f"{prefix}.scales", jnp.float32))
            # Per-tensor bits from shapes (qweight rows = K*bits/32) — supports
            # heterogeneous --observe checkpoints; metadata overrides if present.
            kdim = self.flat[f"{prefix}.g_idx"].shape[0]
            shape_bits = int(self.flat[f"{prefix}.qweight"].shape[0] * 32 // kdim)
            bits = self.meta_bits.get(prefix, shape_bits or self.default_bits)
            return PackedLinear.from_wire(
                self.flat[f"{prefix}.qweight"], self.flat[f"{prefix}.qzeros"],
                scales, self.flat[f"{prefix}.g_idx"], bits=bits, bias=bias,
                dtype=self.dtype)
        w = self.tensor(f"{prefix}.weight").T
        b = self.tensor(f"{prefix}.bias") if f"{prefix}.bias" in self.flat else None
        return dense(w, b)

    def conv1d(self, prefix):
        """transformers Conv1D (GPT-2-class): weight is stored (in, out) —
        already this framework's kernel convention, so NO transpose (the
        reference instead transposes it to fit its (out, in) solver,
        gptq.py:62-64,89-93). Packed buffers are layout-free (standard GPTQ
        wire format) and share the packed branch of linear()."""
        if f"{prefix}.qweight" in self.flat:
            return self.linear(prefix)
        w = self.tensor(f"{prefix}.weight")
        b = self.tensor(f"{prefix}.bias") if f"{prefix}.bias" in self.flat else None
        return dense(w, b)


def _infer_bits_from_shapes(flat: dict) -> int | None:
    """Infer wbits from a packed checkpoint: qweight rows = K*bits/32, K = len(g_idx)."""
    for k in flat:
        if k.endswith(".qweight"):
            gk = k[:-len("qweight")] + "g_idx"
            if gk in flat:
                kdim = flat[gk].shape[0]
                return int(flat[k].shape[0] * 32 // kdim)
    return None


def load_params(model_path: str, cfg: ModelConfig | None = None, dtype=jnp.bfloat16,
                wbits: int | None = None, seqlen: int | None = None):
    """Load a HF (or packed-GPTQ) checkpoint directory into (cfg, params)."""
    if cfg is None:
        cfg = config_from_hf(model_path, seqlen=seqlen)
    flat = read_flat_state(model_path)
    bits = wbits or _infer_bits_from_shapes(flat) or 4
    m = _Mapper(flat, dtype, default_bits=bits)
    meta_path = os.path.join(model_path, "quantize_config.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            qc = json.load(f)
        if wbits is None:  # an explicit wbits argument wins over metadata
            m.default_bits = int(qc.get("bits", m.default_bits))
        # heterogeneous checkpoints (--observe): per-linear bits overrides
        # written by engine/checkpoint.save_packed. per_layer keys are
        # model-relative dotted paths; the flat state dict carries the HF
        # prefix — map by dot-anchored suffix on each linear's g_idx key.
        for name, over in qc.get("per_layer", {}).items():
            for k in flat:
                if k == f"{name}.g_idx" or k.endswith(f".{name}.g_idx"):
                    m.meta_bits[k[:-len(".g_idx")]] = int(over["bits"])

    if cfg.arch == "llama":
        params = _load_llama(m, cfg)
    elif cfg.arch == "opt":
        params = _load_opt(m, cfg)
    elif cfg.arch == "neox":
        params = _load_neox(m, cfg)
    elif cfg.arch == "gpt2":
        params = _load_gpt2(m, cfg)
    else:
        raise ValueError(cfg.arch)
    return cfg, params


def _load_llama(m: _Mapper, cfg: ModelConfig):
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        layers.append({
            "input_layernorm": m.norm(f"{p}.input_layernorm"),
            "post_attention_layernorm": m.norm(f"{p}.post_attention_layernorm"),
            "self_attn": {n: m.linear(f"{p}.self_attn.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {n: m.linear(f"{p}.mlp.{n}")
                    for n in ("gate_proj", "up_proj", "down_proj")},
        })
    embed = m.tensor("model.embed_tokens.weight")
    lm_head = (m.linear("lm_head") if m.has("lm_head.weight") or m.has("lm_head.qweight")
               else dense(embed.T))
    return {"embed_tokens": embed, "layers": layers,
            "norm": m.tensor("model.norm.weight"), "lm_head": lm_head}


def _load_opt(m: _Mapper, cfg: ModelConfig):
    d = "model.decoder"
    layers = []
    for i in range(cfg.num_layers):
        p = f"{d}.layers.{i}"
        layers.append({
            "self_attn_layer_norm": m.norm(f"{p}.self_attn_layer_norm"),
            "final_layer_norm": m.norm(f"{p}.final_layer_norm"),
            "self_attn": {n: m.linear(f"{p}.self_attn.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": m.linear(f"{p}.fc1"),
            "fc2": m.linear(f"{p}.fc2"),
        })
    embed = m.tensor(f"{d}.embed_tokens.weight")
    params = {
        "embed_tokens": embed,
        "embed_positions": m.tensor(f"{d}.embed_positions.weight"),
        "layers": layers,
    }
    if m.has(f"{d}.final_layer_norm.weight"):
        params["final_layer_norm"] = m.norm(f"{d}.final_layer_norm")
    if m.has(f"{d}.project_in.weight"):
        params["project_in"] = m.linear(f"{d}.project_in")
    if m.has(f"{d}.project_out.weight"):
        params["project_out"] = m.linear(f"{d}.project_out")
    params["lm_head"] = (m.linear("lm_head")
                         if m.has("lm_head.weight")
                         or m.has("lm_head.qweight")  # packed untied head
                         else dense(embed.T))
    return params


def _load_gpt2(m: _Mapper, cfg: ModelConfig):
    t = "transformer"
    layers = []
    for i in range(cfg.num_layers):
        p = f"{t}.h.{i}"
        layers.append({
            "ln_1": m.norm(f"{p}.ln_1"),
            "ln_2": m.norm(f"{p}.ln_2"),
            "attn": {"c_attn": m.conv1d(f"{p}.attn.c_attn"),
                     "c_proj": m.conv1d(f"{p}.attn.c_proj")},
            "mlp": {"c_fc": m.conv1d(f"{p}.mlp.c_fc"),
                    "c_proj": m.conv1d(f"{p}.mlp.c_proj")},
        })
    wte = m.tensor(f"{t}.wte.weight")
    # a packed (untied, --quantize-lm-head) head may exist; tied otherwise
    lm_head = (m.linear("lm_head") if m.has("lm_head.weight")
               or m.has("lm_head.qweight") else dense(wte.T))
    return {"wte": wte, "wpe": m.tensor(f"{t}.wpe.weight"),
            "layers": layers, "ln_f": m.norm(f"{t}.ln_f"),
            "lm_head": lm_head}


def _load_neox(m: _Mapper, cfg: ModelConfig):
    g = "gpt_neox"
    layers = []
    for i in range(cfg.num_layers):
        p = f"{g}.layers.{i}"
        layers.append({
            "input_layernorm": m.norm(f"{p}.input_layernorm"),
            "post_attention_layernorm": m.norm(f"{p}.post_attention_layernorm"),
            "attention": {
                "query_key_value": m.linear(f"{p}.attention.query_key_value"),
                "dense": m.linear(f"{p}.attention.dense"),
            },
            "mlp": {
                "dense_h_to_4h": m.linear(f"{p}.mlp.dense_h_to_4h"),
                "dense_4h_to_h": m.linear(f"{p}.mlp.dense_4h_to_h"),
            },
        })
    embed = m.tensor(f"{g}.embed_in.weight")
    return {
        "embed_in": embed,
        "layers": layers,
        "final_layer_norm": m.norm(f"{g}.final_layer_norm"),
        # tied-embedding checkpoints carry no embed_out.* keys
        "embed_out": (m.linear("embed_out")
                      if m.has("embed_out.weight")
                      or m.has("embed_out.qweight")
                      else dense(embed.T)),
    }
