from .llama import LlamaConfig, init_params, forward, make_kv_cache
from .convert import convert_hf_model, convert_hf_state_dict, load_pretrained
