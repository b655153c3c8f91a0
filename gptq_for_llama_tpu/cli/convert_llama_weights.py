"""Meta LLaMA -> HuggingFace checkpoint conversion.

Thin wrapper over transformers' converter, exactly like the reference
(reference: convert_llama_weights_to_hf.py:1-34 wraps write_model /
write_tokenizer). Run:

  python -m gptq_for_llama_tpu.cli.convert_llama_weights \
      --input_dir /path/to/downloaded/llama --model_size 7B \
      --output_dir /path/to/hf-llama
"""

from __future__ import annotations


def main(argv=None):
    from transformers.models.llama import convert_llama_weights_to_hf as conv
    conv.main() if argv is None else conv.main()


if __name__ == "__main__":
    main()
