"""Emit PPL_r03-style artifact: both pipelines' perplexities on identical
tiny real-weight checkpoints — the REFERENCE's own quantize+eval (torch CPU,
/root/reference/{llama,opt,neox}.py) vs this framework's, same calibration
windows, same test stream (the executable form of the reference's published
wikitext2 tables; see BASELINE.md "documented environment limit" for why no
published checkpoint can be evaluated in this environment).

Usage: python scripts/ppl_parity.py [out.json]
Reuses the tests/test_e2e_ppl.py harness verbatim so the artifact and the CI
check can never diverge.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")  # torch reference is CPU; compare like-for-like

import hf_tiny  # noqa: E402
import test_e2e_ppl as h  # noqa: E402


def main(out_path: str):
    load = h.ref_env.__wrapped__()  # unwrap the pytest fixture
    rows = []
    for arch, actorder, wbits in [("llama", False, 4), ("llama", True, 4),
                                  ("opt", False, 4), ("neox", False, 4),
                                  ("llama", False, 3)]:
        with tempfile.TemporaryDirectory() as d:
            mdir, _ = getattr(hf_tiny, h.ARCHES[arch]["tiny"])(
                os.path.join(d, "model"))
            ref = h._reference_ppl(load, arch, mdir, actorder, wbits)
            fake, packed = h._our_ppl(mdir, actorder, wbits)
        row = {"arch": arch, "act_order": actorder, "wbits": wbits,
               "groupsize": h.GROUPSIZE, "seqlen": h.SEQLEN,
               "nsamples": h.NSAMPLES,
               "reference_ppl": round(ref, 6),
               "ours_fakequant_ppl": round(fake, 6),
               "ours_packed_ppl": round(packed, 6),
               "rel_gap_packed": round(abs(packed - ref) / ref, 9)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    artifact = {
        "note": "dual-pipeline perplexity parity on identical tiny "
                "real-weight checkpoints (no published checkpoint reachable "
                "offline — BASELINE.md); reference numbers come from "
                "executing /root/reference's own code",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(HERE, "PPL_r03.json"))
