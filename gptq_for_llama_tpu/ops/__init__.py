"""Compute ops: the PackedLinear format, quantized matmul dispatch, kernels."""

from .linear import PackedLinear, dense, linear_apply, quant_matmul_xla
from .quant_matmul import fused_gate_up, quant_matmul

__all__ = ["PackedLinear", "dense", "linear_apply", "quant_matmul_xla",
           "fused_gate_up", "quant_matmul"]
