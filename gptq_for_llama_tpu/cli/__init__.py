"""CLI entry points (reference: llama.py/opt.py/neox.py __main__ blocks)."""
