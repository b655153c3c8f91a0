"""CLI front doors: `python -m gptq_for_llama_tpu serve` (continuous-batching
daemon, beyond the reference) and the main CLI's --tp shard_map path."""

import json
import os

import numpy as np
import pytest

import hf_tiny


@pytest.fixture(scope="module")
def packed_dir(tmp_path_factory):
    """Quantize + pack the tiny llama once for all CLI tests here."""
    from gptq_for_llama_tpu.cli.main import main
    root = tmp_path_factory.mktemp("serve_cli")
    mdir, _ = hf_tiny.tiny_llama_dir(str(root / "m"))
    # minimal tokenizer so --prompts / --test-generation work offline
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    vocab = {w: i for i, w in enumerate(
        ["<unk>", "hello", "world", "the", "quick", "brown", "fox"])}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                            eos_token="<unk>").save_pretrained(mdir)
    out = str(root / "packed")
    main([mdir, "synthetic", "--wbits", "4", "--groupsize", "16",
          "--nsamples", "4", "--chunk", "4", "--seqlen", "32",
          "--save", out])
    return mdir, out


def _stats_and_records(captured: str):
    lines = [json.loads(l) for l in captured.splitlines()
             if l.startswith("{")]
    return lines[-1], lines[:-1]


def test_serve_cli_demo(packed_dir, capsys):
    from gptq_for_llama_tpu.cli.serve import main
    mdir, packed = packed_dir
    main([mdir, "--load", packed, "--demo", "4", "--demo-prompt-len", "8",
          "--max-new-tokens", "6", "--slots", "2", "--span", "2",
          "--buckets", "16", "--max-seq-len", "32", "--quiet"])
    stats, recs = _stats_and_records(capsys.readouterr().out)
    assert stats["requests"] == 4 and stats["tokens"] == 4 * 6
    assert stats["slots"] == 2 and stats["span"] == 2
    assert [r["uid"] for r in recs] == [0, 1, 2, 3]
    assert all(len(r["tokens"]) == 6 for r in recs)


def test_serve_cli_paged_chunked(packed_dir, capsys):
    from gptq_for_llama_tpu.cli.serve import main
    mdir, packed = packed_dir
    main([mdir, "--load", packed, "--demo", "3", "--demo-prompt-len", "9",
          "--max-new-tokens", "5", "--slots", "2", "--paged",
          "--block-size", "8", "--prefill-chunk", "8",
          "--buckets", "16", "--max-seq-len", "32", "--quiet"])
    stats, recs = _stats_and_records(capsys.readouterr().out)
    assert stats["requests"] == 3 and stats["paged"] is True
    assert all(len(r["tokens"]) == 5 for r in recs)


def test_serve_cli_prompts_file(packed_dir, capsys, tmp_path):
    from gptq_for_llama_tpu.cli.serve import main
    mdir, packed = packed_dir
    pf = tmp_path / "prompts.txt"
    pf.write_text("hello world\nthe quick brown fox\n")
    main([mdir, "--load", packed, "--prompts", str(pf),
          "--max-new-tokens", "4", "--slots", "2",
          "--buckets", "16", "--max-seq-len", "32", "--quiet"])
    stats, recs = _stats_and_records(capsys.readouterr().out)
    assert stats["requests"] == 2
    assert all("text" in r for r in recs)


def test_serve_cli_shard_map_tp(packed_dir, capsys):
    """--tp on the serve CLI builds a mesh and runs the shard_map TP engine;
    greedy output must match the single-device run (token-exact on CPU)."""
    from gptq_for_llama_tpu.cli.serve import main
    mdir, packed = packed_dir
    common = [mdir, "--load", packed, "--demo", "3", "--demo-prompt-len", "8",
              "--max-new-tokens", "6", "--slots", "2",
              "--buckets", "16", "--max-seq-len", "32", "--quiet"]
    main(common)
    _, recs1 = _stats_and_records(capsys.readouterr().out)
    main(common + ["--tp", "2"])
    stats, recs2 = _stats_and_records(capsys.readouterr().out)
    assert stats["tp"] == 2
    assert [r["tokens"] for r in recs1] == [r["tokens"] for r in recs2]


def test_main_cli_tp_benchmark_and_generation(packed_dir, capsys):
    """--tp on the main CLI: benchmark runs through the shard_map TP runner
    (ModelRunner mesh path), matching the single-device ppl/check exactly."""
    from gptq_for_llama_tpu.cli.main import main
    mdir, packed = packed_dir
    main([mdir, "synthetic", "--load", packed, "--seqlen", "32",
          "--benchmark", "8", "--check"])
    base = json.loads([l for l in capsys.readouterr().out.splitlines()
                       if l.startswith("{")][-1])
    main([mdir, "synthetic", "--load", packed, "--seqlen", "32",
          "--benchmark", "8", "--check", "--tp", "2"])
    out = capsys.readouterr().out
    assert "tensor-parallel over mesh" in out
    res = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert res["tokens"] == 8
    # psum reorders the row-parallel reductions: small fp drift is expected
    np.testing.assert_allclose(res["ppl"], base["ppl"], rtol=2e-3)
