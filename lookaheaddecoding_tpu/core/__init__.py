from .layout import Layout, build_layout
from .engine import LookaheadEngine, GenerationResult
from .state import DecodeState
