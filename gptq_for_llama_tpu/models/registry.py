"""Architecture registry: one generic engine + small per-arch adapters.

The reference's three ~85%-identical driver scripts (llama.py / opt.py / neox.py)
prove the per-arch delta is just: module paths, sequential grouping, positional
embedding type, and projection quirks (SURVEY.md §1). Each arch module exposes the
same functional surface; everything else in the framework is arch-agnostic.
"""

from __future__ import annotations

from . import gpt2, llama, neox, opt

ARCHS = {m.NAME: m for m in (llama, opt, neox, gpt2)}


def get_arch(name: str):
    if name not in ARCHS:
        raise ValueError(f"Unknown arch {name!r}; supported: {sorted(ARCHS)}")
    return ARCHS[name]
