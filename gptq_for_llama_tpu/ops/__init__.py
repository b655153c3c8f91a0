"""Compute ops: the PackedLinear format, quantized matmul dispatch, kernels.

Note: the dispatch functions live in the `quant_matmul` SUBMODULE; they are
deliberately not re-exported here because a same-named attribute would shadow
the submodule for `from ..ops import quant_matmul` importers.
"""

from .linear import PackedLinear, dense, linear_apply, quant_matmul_xla

__all__ = ["PackedLinear", "dense", "linear_apply", "quant_matmul_xla"]
