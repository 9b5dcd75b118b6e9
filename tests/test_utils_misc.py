"""Coverage for logging/profiling utilities and application imports."""

import numpy as np

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.engine import GenerationResult
from lookaheaddecoding_tpu.utils.profiling import StepTimer


def _result(gen, steps):
    return GenerationResult(
        tokens=np.arange(10 + gen), prompt_len=10, steps=steps)


def test_decode_log_history_and_roundtrip(tmp_path):
    log = lt.DecodeLog()
    assert log.log_history() is None
    log.append(_result(30, 10))
    log.append(_result(20, 20))
    msg = log.log_history()
    assert "Generated tokens: 50" in msg and "Total steps: 30" in msg
    p = str(tmp_path / "log.json")
    log.save(p)
    log2 = lt.DecodeLog.load(p)
    assert log2.records == [[30, 10, 3.0], [20, 20, 1.0]]
    log.log_history(clear=True)
    assert log.records == []


def test_generation_result_accounting():
    r = _result(24, 8)
    assert r.num_generated == 24
    assert r.compression_ratio == 3.0
    assert len(r.new_tokens) == 24
    r.wall_time_s = 2.0
    assert r.tokens_per_sec == 12.0


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    assert len(t.times) == 3 and t.mean_ms >= 0


def test_application_modules_import():
    # argparse surfaces exist and build without optional deps
    from applications import eval_common
    ap = eval_common.base_parser()
    args = ap.parse_args(["--level", "5", "--tp", "2", "--use-flash", "1"])
    assert args.level == 5 and args.tp == 2 and args.use_flash == 1
    import applications.eval_mtbench  # noqa: F401
    import applications.eval_xsum  # noqa: F401
    import applications.eval_cnndm  # noqa: F401
    import applications.eval_humaneval  # noqa: F401
    import applications.eval_classeval  # noqa: F401
    import applications.chatbot  # noqa: F401
    import applications.minimal  # noqa: F401
    import applications.train_synthetic  # noqa: F401
