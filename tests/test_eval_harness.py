"""Eval-harness tests: run_eval loop, JSONL answers, reorg dedup
(reference eval_mtbench.py:195-400) — with a stub tokenizer and the tiny
engine so no network/datasets are needed."""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from applications import eval_common
from applications.eval_mtbench import build_prompt as mtbench_prompt


class StubTokenizer:
    eos_token_id = 1

    def __call__(self, text, **kw):
        ids = [(2 + (ord(c) % 60)) for c in text][:64]

        class R:
            input_ids = ids
        return R()

    def decode(self, ids, **kw):
        return "".join(chr(int(i) % 26 + 97) for i in ids)


def tiny_engine():
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    log = lt.DecodeLog()
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32"),
        log=log)
    return eng, StubTokenizer(), log


def test_run_eval_writes_sorted_deduped_answers(tmp_path, monkeypatch):
    monkeypatch.setattr(eval_common, "make_engine", lambda args: tiny_engine())
    ap = eval_common.base_parser()
    args = ap.parse_args([
        "--max-new-token", "16", "--level", "4", "--window", "5",
        "--guess", "4"])
    questions = [
        {"question_id": 82, "turns": ["hello there", "tell me more"]},
        {"question_id": 81, "turns": ["compose a report"]},
    ]
    answer_file = str(tmp_path / "ans.jsonl")
    stats = eval_common.run_eval(
        args, questions, mtbench_prompt, answer_file,
        num_turns=lambda q: len(q["turns"]))
    assert len(stats) == 3  # 2 turns + 1 turn

    lines = [json.loads(l) for l in open(answer_file)]
    assert [l["question_id"] for l in lines] == [81, 82]
    assert len(lines[1]["choices"][0]["turns"]) == 2

    # append a duplicate for qid 81; reorg keeps the LAST one
    with open(answer_file, "a") as f:
        f.write(json.dumps({"question_id": 81, "model_id": "x",
                            "choices": [{"index": 0, "turns": ["v2"]}],
                            "tstamp": 0}) + "\n")
    eval_common.reorg_answer_file(answer_file)
    lines = [json.loads(l) for l in open(answer_file)]
    assert [l["question_id"] for l in lines] == [81, 82]
    assert lines[0]["choices"][0]["turns"] == ["v2"]


def test_mtbench_prompt_folds_prior_turns():
    q = {"turns": ["first question", "second question"]}
    p0 = mtbench_prompt(q, [])
    assert p0 == "[INST] first question [/INST]"
    p1 = mtbench_prompt(q, ["answer one"])
    assert p1 == ("[INST] first question [/INST] answer one "
                  "[INST] second question [/INST]")


def test_baseline_and_sample_modes_through_harness(tmp_path, monkeypatch):
    monkeypatch.setattr(eval_common, "make_engine", lambda args: tiny_engine())
    ap = eval_common.base_parser()
    for extra in (["--use-lade", "0"], ["--do-sample"]):
        args = ap.parse_args(["--max-new-token", "8"] + extra)
        answer_file = str(tmp_path / f"ans{extra[0][2:4]}.jsonl")
        stats = eval_common.run_eval(
            args, [{"question_id": 1, "turns": ["hi"]}],
            mtbench_prompt, answer_file)
        assert stats and stats[0][1] > 0
