"""lookaheaddecoding_tpu — a TPU-native lookahead decoding inference engine.

Brand-new JAX/XLA/Pallas implementation of exact, draft-model-free parallel
decoding with the capabilities of hao-ai-lab/LookaheadDecoding (reference
mounted read-only at /root/reference; see SURVEY.md for the structural map).
"""

from .config import EngineConfig, LookaheadConfig, SamplingConfig
from .core.engine import GenerationResult, LookaheadEngine, PrefixCache
from .core.layout import Layout, build_layout
from .models.llama import LlamaConfig, init_params
from .models.convert import convert_hf_model, convert_hf_state_dict, load_pretrained
from .utils.logging import DecodeLog
from .utils.checkpoint import load_params, save_params
from .core.serving import ContinuousBatchingEngine, Request
from .core.paged_serving import PagedPrefix, PagedServingEngine
from .ops.quant import quantize_params
from .utils.tuning import TuneResult, autotune

__all__ = [
    "EngineConfig",
    "LookaheadConfig",
    "SamplingConfig",
    "LookaheadEngine",
    "GenerationResult",
    "PrefixCache",
    "Layout",
    "build_layout",
    "LlamaConfig",
    "init_params",
    "convert_hf_model",
    "convert_hf_state_dict",
    "load_pretrained",
    "DecodeLog",
    "load_params",
    "save_params",
    "ContinuousBatchingEngine",
    "Request",
    "PagedServingEngine",
    "PagedPrefix",
    "quantize_params",
    "autotune",
    "TuneResult",
]

__version__ = "0.1.0"
