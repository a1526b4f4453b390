from .compressor import (compress_layer_kv, dequantize_layer_cache,
                         identify_prompt_length, summarize_layer_stats)
from .kv_cache import (CompressedLayerCache, RecentCache, TierCache,
                       append_recent, init_recent_cache)

__all__ = [
    "compress_layer_kv", "dequantize_layer_cache", "identify_prompt_length",
    "summarize_layer_stats", "CompressedLayerCache", "RecentCache",
    "TierCache", "append_recent", "init_recent_cache",
]
