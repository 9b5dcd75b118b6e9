"""Chatbot REPL smoke tests (reference applications/chatbot.py:8-98):
canned mode end-to-end with a stub tokenizer and a tiny in-process model,
in both full-reprefill and --kv-reuse (conversation PrefixCache) modes.
Follows the stub-engine pattern of test_eval_harness.py."""

import sys

import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from applications import chatbot


class StubTokenizer:
    eos_token_id = 1

    def __call__(self, text, **kw):
        ids = [(2 + (ord(c) % 60)) for c in text][:48]

        class R:
            input_ids = ids
        return R()

    def decode(self, ids, **kw):
        return "".join(chr(int(i) % 26 + 97) for i in ids)


def _fake_load(model, dtype=None):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    return mcfg, params, StubTokenizer()


@pytest.mark.parametrize("extra", [
    [], ["--kv-reuse"],
    ["--do-sample", "--temperature", "0.9", "--top-k", "16"],
    ["--kv-reuse", "--do-sample"],
])
def test_chatbot_canned_smoke(monkeypatch, capsys, extra):
    monkeypatch.setattr(lt, "load_pretrained", _fake_load)
    monkeypatch.setattr(sys, "argv", [
        "chatbot.py", "--canned", "--max-new-tokens", "8",
        "--level", "3", "--window", "4", "--guess", "3",
        "--max-seq-len", "256", "--prefill-chunk", "16"] + extra)
    chatbot.main()
    out = capsys.readouterr().out
    # one throughput report per canned turn
    assert out.count("tok/s]") == len(chatbot.CANNED)
    assert "ASSISTANT:" in out


def test_chatbot_kv_reuse_context_full_recovers(monkeypatch, capsys):
    """ADVICE r4: when the conversation outgrows max_seq_len the REPL must
    degrade (drop history, retry the turn) instead of crashing."""
    monkeypatch.setattr(lt, "load_pretrained", _fake_load)
    monkeypatch.setattr(sys, "argv", [
        "chatbot.py", "--canned", "--kv-reuse", "--max-new-tokens", "24",
        "--level", "3", "--window", "4", "--guess", "3",
        "--max-seq-len", "128", "--prefill-chunk", "16"])
    chatbot.main()
    cap = capsys.readouterr()
    # both canned turns completed (no crash), and the overflow was reported
    assert cap.out.count("tok/s]") == len(chatbot.CANNED)
    assert "context full" in cap.err
