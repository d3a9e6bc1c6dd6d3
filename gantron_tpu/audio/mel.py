"""Mel-spectrogram featurizer (reference: layers.py:76-114).

wav (B, T) in [-1, 1] -> STFT magnitude -> mel filterbank matmul -> log-clamp.
The whole chain is two MXU matmuls plus elementwise ops; under jit XLA fuses
the window/magnitude/compress stages. A fused Pallas kernel with the same
signature lives in ``gantron_tpu.ops.pallas_mel`` (used when enabled).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gantron_tpu.audio.filters import mel_filterbank
from gantron_tpu.audio.stft import STFT


def dynamic_range_compression(x, C=1, clip_val=1e-5):
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x, C=1):
    return jnp.exp(x) / C


class MelSpectrogram:
    """TacotronSTFT equivalent: holds the STFT + mel basis constants."""

    def __init__(self, filter_length=1024, hop_length=256, win_length=1024,
                 n_mel_channels=80, sampling_rate=22050, mel_fmin=0.0,
                 mel_fmax=8000.0):
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.stft = STFT(filter_length, hop_length, win_length)
        basis = mel_filterbank(sampling_rate, filter_length, n_mel_channels,
                               mel_fmin, mel_fmax)
        self.mel_basis = jnp.asarray(basis)  # (n_mels, cutoff)

    def spectral_normalize(self, magnitudes):
        return dynamic_range_compression(magnitudes)

    def spectral_de_normalize(self, magnitudes):
        return dynamic_range_decompression(magnitudes)

    def __call__(self, y):
        return self.mel_spectrogram(y)

    def mel_spectrogram(self, y):
        """(B, T) float in [-1, 1] -> (B, n_mel_channels, n_frames)."""
        magnitudes = self.stft.magnitude(y)
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, magnitudes,
                         preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return self.spectral_normalize(mel)

    def n_frames(self, num_samples: int) -> int:
        return self.stft.n_frames(num_samples)
