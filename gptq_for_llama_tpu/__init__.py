"""gptq_for_llama_tpu — a TPU-native (JAX/XLA/Pallas) GPTQ quantization + inference framework.

Built from scratch with the capabilities of qwopqwop200/GPTQ-for-LLaMa (see SURVEY.md):
one-shot GPTQ post-training quantization (2/3/4/8-bit + trits, grouped scales/zeros,
act-order, true-sequential, RTN baseline, observer auto-upgrade) for decoder-only LLMs
(LLaMA, OPT, GPT-NeoX), plus a quantized inference engine with fused Pallas kernels,
paged KV cache, and pjit/shard_map tensor sharding over TPU meshes.
"""

__version__ = "0.1.0"
