#!/usr/bin/env bash
# MT-Bench eval driver (reference: applications/run_mtbench.sh).
# Downloads the FastChat question file if absent, then runs the eval with
# and without lookahead for a speedup comparison.
set -e
cd "$(dirname "$0")/.."

MODEL=${MODEL:-meta-llama/Llama-2-7b-chat-hf}
MODEL_ID=${MODEL_ID:-llama2-7b-lade}
LEVEL=${LEVEL:-5}
WIN=${WIN:-15}
GUESS=${GUESS:-15}
QFILE=${QFILE:-data/mt_bench/question.jsonl}

if [ ! -f "$QFILE" ]; then
  mkdir -p "$(dirname "$QFILE")"
  wget -O "$QFILE" https://raw.githubusercontent.com/lm-sys/FastChat/main/fastchat/llm_judge/data/mt_bench/question.jsonl
fi

python applications/eval_mtbench.py --model-path "$MODEL" \
  --model-id "${MODEL_ID}-base" --question-file "$QFILE" --use-lade 0 "$@"
python applications/eval_mtbench.py --model-path "$MODEL" \
  --model-id "$MODEL_ID" --question-file "$QFILE" \
  --level "$LEVEL" --window "$WIN" --guess "$GUESS" "$@"
