from .logging import DecodeLog
from .checkpoint import load_params, save_params
from .tuning import TuneResult, autotune
