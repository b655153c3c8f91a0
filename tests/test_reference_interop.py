"""Cross-implementation parity: run the REFERENCE's own torch-CPU code
(/root/reference, read-only) against this framework on identical inputs.

This is execution of the upstream implementation as an oracle — the strongest
wire-format guarantee available without a GPU: byte-identical packed buffers
and matching quantizer parameters mean reference checkpoints and ours are
interchangeable. Skipped when the reference tree or torch is unavailable.
"""

import importlib.util
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def _load_ref(name, path):
    # load module files directly: the reference package __init__ imports
    # triton (GPU-only), but these modules themselves are guarded/pure
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_quantizer():
    return _load_ref("ref_quantizer", os.path.join(REF, "quant/quantizer.py"))


@pytest.fixture(scope="module")
def ref_quant_linear():
    return _load_ref("ref_quant_linear",
                     os.path.join(REF, "quant/quant_linear.py"))


@pytest.mark.parametrize("sym", [False, True])
@pytest.mark.parametrize("mse", [False, True])
def test_find_params_matches_reference(ref_quantizer, sym, mse):
    import torch
    from gptq_for_llama_tpu.quant.quantizer import (QuantConfig,
                                                    find_params_weight)
    rng = np.random.RandomState(0)
    w = rng.standard_normal((16, 64)).astype(np.float32)

    q = ref_quantizer.Quantizer()
    q.configure(4, perchannel=True, sym=sym, mse=mse)
    q.find_params(torch.from_numpy(w), weight=True)
    ref_scale = q.scale.numpy().reshape(-1)
    ref_zero = q.zero.numpy().reshape(-1)

    cfg = QuantConfig(bits=4, perchannel=True, sym=sym, mse=mse)
    s, z = find_params_weight(jnp.asarray(w), cfg)
    np.testing.assert_allclose(np.asarray(s).reshape(-1), ref_scale,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(z).reshape(-1), ref_zero,
                               rtol=1e-5, atol=1e-7)


@pytest.fixture(scope="module")
def ref_gptq(ref_quantizer):
    """Load the reference GPTQ class with its GPU-only deps stubbed."""
    import types
    import torch
    torch.cuda.synchronize = lambda *a, **k: None  # CPU oracle run
    quant_stub = types.ModuleType("quant")
    quant_stub.Quantizer = ref_quantizer.Quantizer
    sys.modules["quant"] = quant_stub
    tt = types.ModuleType("texttable")

    class Texttable:
        def header(self, *a): pass
        def set_cols_dtype(self, *a): pass
        def add_row(self, *a): pass
        def draw(self): return "\n"

    tt.Texttable = Texttable
    sys.modules["texttable"] = tt
    ut = types.ModuleType("utils")
    ut.torch_snr_error = lambda *a, **k: torch.tensor(0.0)
    sys.modules["utils"] = ut
    return _load_ref("ref_gptq", os.path.join(REF, "gptq.py"))


@pytest.mark.parametrize("actorder", [False, True])
def test_gptq_solver_matches_reference(ref_gptq, actorder):
    """Full solver parity on identical weights/activations: scales, zeros,
    g_idx exact; quantized weights equal up to rare round-boundary ties."""
    import torch
    from gptq_for_llama_tpu.quant.gptq import batch_hessian, gptq_quantize
    from gptq_for_llama_tpu.quant.quantizer import QuantConfig
    rng = np.random.RandomState(0)
    K, N, GS = 64, 32, 16
    w = rng.standard_normal((N, K)).astype(np.float32)
    xs = rng.standard_normal((4, 8, K)).astype(np.float32)

    lin = torch.nn.Linear(K, N, bias=False)
    lin.weight.data = torch.from_numpy(w.copy())
    g = ref_gptq.GPTQ(lin)
    g.quantizer.configure(4, perchannel=True, sym=False, mse=False)
    for i in range(4):
        g.add_batch(torch.from_numpy(xs[i]), torch.zeros(1))
    scale, zero, g_idx, err = g.fasterquant(blocksize=128, percdamp=0.01,
                                            groupsize=GS, actorder=actorder)
    q_ref = lin.weight.data.numpy()

    h = batch_hessian(jnp.asarray(xs))
    res = gptq_quantize(jnp.asarray(w), h, QuantConfig(bits=4), blocksize=128,
                        percdamp=0.01, groupsize=GS, actorder=actorder)
    np.testing.assert_allclose(np.asarray(res.scale), scale.numpy(),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.zero), zero.numpy(),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(res.g_idx), g_idx.numpy())
    # per-element: allow <1% round-boundary flips from Cholesky fp ordering
    mismatch = np.abs(np.asarray(res.qweight) - q_ref) > 1e-5
    assert mismatch.mean() < 0.01, f"{mismatch.sum()}/{mismatch.size} differ"
    # objective parity: our total error within 2% of the reference's
    assert abs(float(res.error) - float(err)) <= 0.02 * float(err)


def test_packed_buffers_match_reference(ref_quant_linear):
    """Same quantized weight packed by both implementations: byte-identical."""
    import torch
    from gptq_for_llama_tpu.quant import packing
    rng = np.random.RandomState(1)
    K, N, GS, BITS = 64, 32, 16, 4
    G = K // GS
    # a lattice-aligned weight with integer codes and zeros >= 1
    codes = rng.randint(0, 16, size=(N, K)).astype(np.float32)
    zeros = rng.randint(1, 15, size=(N, G)).astype(np.float32)
    scales = (rng.rand(N, G) * 0.02 + 0.005).astype(np.float32)
    g_idx = (np.arange(K) // GS).astype(np.int32)
    w = (codes - zeros[:, g_idx]) * scales[:, g_idx]  # (N, K)

    # reference pack (torch CPU)
    lin = torch.nn.Linear(K, N, bias=False)
    lin.weight.data = torch.from_numpy(w)
    ql = ref_quant_linear.QuantLinear(BITS, GS, K, N, bias=False)
    ql.pack(lin, torch.from_numpy(scales), torch.from_numpy(zeros),
            g_idx=torch.from_numpy(g_idx))

    # our pack
    ours = packing.pack_quantized(w, scales, zeros, g_idx, BITS)

    np.testing.assert_array_equal(ours["qweight"], ql.qweight.numpy())
    np.testing.assert_array_equal(ours["qzeros"], ql.qzeros.numpy())
    np.testing.assert_array_equal(ours["scales"],
                                  ql.scales.numpy().astype(np.float16))
    np.testing.assert_array_equal(ours["g_idx"], ql.g_idx.numpy())

    # and our loader dequantizes the reference's buffers back to w exactly
    from gptq_for_llama_tpu.ops.linear import PackedLinear
    pl_ = PackedLinear.from_wire(ql.qweight.numpy(), ql.qzeros.numpy(),
                                 ql.scales.numpy().astype(np.float32),
                                 ql.g_idx.numpy(), bits=BITS, dtype=jnp.float32)
    wd = np.asarray(pl_.dequantize(jnp.float32)).T  # (N, K)
    np.testing.assert_allclose(wd, w, atol=2e-4, rtol=1e-3)


def test_reference_load_quant_accepts_our_checkpoint(ref_quant_linear,
                                                     tmp_path):
    """Full-checkpoint interchangeability, load direction: a checkpoint saved
    by our pipeline loads into the reference's own quantized model skeleton
    (make_quant_linear + strict load_state_dict — the state-dict half of
    llama.py:279-310 load_quant; its triton warmup cannot run on CPU) with
    every key, shape, and packed buffer accepted, and the packed buffers
    byte-match what our PackedLinear reports as its wire form."""
    import torch
    import jax.numpy as jnp
    import hf_tiny
    from safetensors.torch import load_file as safe_load
    from gptq_for_llama_tpu.cli.main import main

    mdir, _ = hf_tiny.tiny_llama_dir(tmp_path / "m")
    out = str(tmp_path / "packed")
    main([mdir, "synthetic", "--wbits", "4", "--groupsize", "16",
          "--nsamples", "4", "--chunk", "4", "--seqlen", "32", "--save", out])

    from transformers import LlamaConfig, LlamaForCausalLM, modeling_utils
    config = LlamaConfig.from_pretrained(mdir)
    # skip weight init (all buffers are about to be overwritten by the
    # checkpoint) — restore the patched globals so later tests in this
    # process still get initialized torch models
    noop = lambda *a, **k: None
    saved = (torch.nn.init.kaiming_uniform_, torch.nn.init.uniform_,
             torch.nn.init.normal_, modeling_utils._init_weights)
    torch.nn.init.kaiming_uniform_ = noop
    torch.nn.init.uniform_ = noop
    torch.nn.init.normal_ = noop
    modeling_utils._init_weights = False
    try:
        model = LlamaForCausalLM(config).eval()
    finally:
        (torch.nn.init.kaiming_uniform_, torch.nn.init.uniform_,
         torch.nn.init.normal_, modeling_utils._init_weights) = saved
    ref_mu = _load_ref("ref_modelutils_interop", os.path.join(REF, "utils/modelutils.py"))
    find_layers = ref_mu.find_layers
    layers = find_layers(model)
    del layers["lm_head"]
    ref_quant_linear.make_quant_linear(model, layers, 4, 16)

    state = safe_load(os.path.join(out, "model.safetensors"))
    model.load_state_dict(state, strict=True)  # every key/shape accepted

    # spot-check byte parity of one packed buffer vs our loader's wire form
    cfg, params = None, None
    import gptq_for_llama_tpu.models.hf_loader as hf_loader
    cfg, params = hf_loader.load_params(out, seqlen=32, dtype=jnp.float32)
    wire = params["layers"][0]["self_attn"]["q_proj"].to_wire()
    ql = model.model.layers[0].self_attn.q_proj
    np.testing.assert_array_equal(wire["qweight"], ql.qweight.numpy())
    np.testing.assert_array_equal(wire["qzeros"], ql.qzeros.numpy())
    np.testing.assert_array_equal(wire["scales"],
                                  ql.scales.numpy().astype(np.float16))
    np.testing.assert_array_equal(wire["g_idx"], ql.g_idx.numpy())
