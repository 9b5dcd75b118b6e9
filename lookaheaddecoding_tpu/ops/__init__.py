from .sampling import rejection_sample_verify, sample_token, warp_logits
from .quant import (
    dequantize_weight, qmatmul, quantize_params, quantize_weight)
from .lookahead_attention import lookahead_attention
