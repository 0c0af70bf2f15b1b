from .attention import attention_reference, multi_head_attention
from .conv import depthwise_conv1d, depthwise_conv1d_cm
from .fftconv import causal_long_conv_cm, fft_causal_conv
from .flash_attention import flash_attention
from .selective_scan import (selective_scan, selective_scan_auto,
                             selective_scan_chunked, selective_scan_cm,
                             selective_scan_reference, selective_scan_seq)
from .window import (compute_shift_mask, compute_shift_regions, get_window_size,
                     pad_to_window_multiple, relative_position_index,
                     window_partition, window_reverse)
from .window_attention import windowed_attention_proj

__all__ = [
    "attention_reference", "multi_head_attention", "flash_attention",
    "depthwise_conv1d", "fft_causal_conv", "selective_scan",
    "selective_scan_auto", "selective_scan_seq", "selective_scan_cm",
    "depthwise_conv1d_cm", "causal_long_conv_cm",
    "selective_scan_chunked", "selective_scan_reference", "window_partition",
    "window_reverse", "compute_shift_mask", "get_window_size",
    "relative_position_index", "pad_to_window_multiple",
    "compute_shift_regions", "windowed_attention_proj",
]
