from msc_tpu.models.tokenizer import ByteTokenizer
from msc_tpu.models.vlm import VLM, init_vlm_params

__all__ = ["ByteTokenizer", "VLM", "init_vlm_params"]
