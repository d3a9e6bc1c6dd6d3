from gantron_tpu.audio.filters import (hann_window, mel_filterbank,
                                       window_sumsquare)
from gantron_tpu.audio.mel import (MelSpectrogram, dynamic_range_compression,
                                   dynamic_range_decompression)
from gantron_tpu.audio.stft import STFT, griffin_lim

__all__ = [
    "STFT", "MelSpectrogram", "griffin_lim", "hann_window", "mel_filterbank",
    "window_sumsquare", "dynamic_range_compression",
    "dynamic_range_decompression",
]
