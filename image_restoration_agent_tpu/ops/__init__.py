from .layernorm import layer_norm_2d, layer_norm_bias_free, layer_norm_with_bias
from .gates import simple_gate, gated_gelu
from .pixel_shuffle import pixel_shuffle, pixel_unshuffle
from .mdta import mdta_attention
from .window_attention import (
    window_partition,
    window_reverse,
    relative_position_index,
    window_attention,
)

__all__ = [
    "layer_norm_2d", "layer_norm_bias_free", "layer_norm_with_bias",
    "simple_gate", "gated_gelu",
    "pixel_shuffle", "pixel_unshuffle",
    "mdta_attention",
    "window_partition", "window_reverse", "relative_position_index",
    "window_attention",
]
