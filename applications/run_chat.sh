#!/usr/bin/env bash
# Chatbot driver (reference: applications/run_chat.sh).
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:-TinyLlama/TinyLlama-1.1B-Chat-v1.0}
USE_LADE=${USE_LADE:-1}
exec python applications/chatbot.py --model "$MODEL" "$@"
