"""Inference runtime: KV-cached runner, sampling, generation, benchmark."""

from .runner import (KVCache, ModelRunner, benchmark_decode, generate,
                     sample_logits, stack_layers)

__all__ = ["KVCache", "ModelRunner", "benchmark_decode", "generate",
           "sample_logits", "stack_layers"]
