from .compressor import (compress_layer_kv, compress_layer_kv_chunked,
                         concat_layer_caches, dequantize_layer_cache,
                         identify_prompt_length, summarize_layer_stats,
                         summarize_layer_stats_per_row)
from .kv_cache import (CompressedLayerCache, DecodePool, RecentCache,
                       TierCache, append_recent, dequantize_decode_pool,
                       flush_recent, init_decode_pool, init_recent_cache)

__all__ = [
    "compress_layer_kv", "compress_layer_kv_chunked",
    "concat_layer_caches", "dequantize_layer_cache",
    "identify_prompt_length",
    "summarize_layer_stats", "summarize_layer_stats_per_row",
    "CompressedLayerCache", "DecodePool", "RecentCache", "TierCache",
    "append_recent", "dequantize_decode_pool", "flush_recent",
    "init_decode_pool", "init_recent_cache",
]
