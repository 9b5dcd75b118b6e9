"""CNN/DailyMail summarization evaluation (reference:
applications/eval_cnndm.py; dataset load at :46)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from applications.eval_common import (  # noqa: E402
    base_parser, llama2_chat_prompt, run_eval)
from applications.eval_xsum import SUMM_INSTRUCTION  # noqa: E402


def load_questions(limit=None):
    from datasets import load_dataset
    docs = load_dataset(
        "cnn_dailymail", "3.0.0", split="validation")["article"]
    qs = [{"question_id": i, "article": a} for i, a in enumerate(docs)]
    return qs[:limit] if limit else qs


def build_prompt(q, prior):
    return llama2_chat_prompt(f"{q['article']}\n\n{SUMM_INSTRUCTION}")


def main():
    ap = base_parser()
    ap.add_argument("--num-questions", type=int, default=100)
    args = ap.parse_args()
    answer_file = args.answer_file or f"data/cnndm/{args.model_id}.jsonl"
    run_eval(args, load_questions(args.num_questions), build_prompt,
             answer_file)


if __name__ == "__main__":
    main()
