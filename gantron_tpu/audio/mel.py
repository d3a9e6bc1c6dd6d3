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
                 mel_fmax=8000.0, backend="xla"):
        """``backend``: 'xla' (einsum pipeline) or 'pallas' (fused TPU
        kernel, ~10% faster; interpret-mode off TPU)."""
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.backend = backend
        self._cfg = (filter_length, hop_length, win_length, n_mel_channels,
                     sampling_rate, mel_fmin, mel_fmax)
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
        if self.backend == "pallas":
            from gantron_tpu.ops.pallas_mel import pallas_mel_spectrogram

            return pallas_mel_spectrogram(y, *self._cfg)
        magnitudes = self.stft.magnitude(y)
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, magnitudes,
                         preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return self.spectral_normalize(mel)

    def n_frames(self, num_samples: int) -> int:
        return self.stft.n_frames(num_samples)


def mel_to_wav_griffin_lim(mel, mel_fn: "MelSpectrogram", n_iters=30,
                           key=None):
    """Vocoder-free synthesis: invert the log-mel via the filterbank
    pseudo-inverse, then Griffin-Lim phase recovery (the reference ships
    griffin_lim as the WaveGlow-free fallback, audio_processing.py:59-75).

    mel: (B, n_mel, T) log-compressed mel. Returns (B, T_samples) float32.
    """
    import numpy as np

    from gantron_tpu.audio.stft import griffin_lim

    # Degenerate inputs (an untrained gate firing on frame 1 gives a 1-frame
    # mel) crash the ISTFT's reflect pad; right-pad to a safe minimum and
    # trim the waveform back afterwards.
    T = mel.shape[2]
    min_frames = mel_fn.stft.filter_length // mel_fn.stft.hop_length + 1
    if T < min_frames:
        mel = jnp.pad(mel, ((0, 0), (0, 0), (0, min_frames - T)),
                      constant_values=-11.5129)  # log(1e-5): silence floor

    mag_mel = dynamic_range_decompression(mel)
    pinv = jnp.asarray(np.linalg.pinv(np.asarray(mel_fn.mel_basis)))
    magnitudes = jnp.maximum(jnp.einsum("fm,bmt->bft", pinv, mag_mel), 0.0)
    wav = griffin_lim(magnitudes, mel_fn.stft, n_iters=n_iters, key=key)
    return wav[:, : T * mel_fn.stft.hop_length]


def power_to_db(S, amin=1e-10, top_db=80.0, ref_axis=None):
    """librosa ``power_to_db(..., ref=np.max)``: 10*log10(S/max), floored at
    max - top_db. Used by the classifier featurizer (reference
    classifier.py:220-226).

    ``ref_axis``: axes the max reference is taken over. librosa operates on
    one spectrogram at a time, so a batched caller must pass per-sample axes
    (e.g. ``(-2, -1)``) — a single global max would shift every sample's dB
    scale by the loudest utterance in the batch."""
    ref = jnp.maximum(jnp.max(S, axis=ref_axis, keepdims=ref_axis is not None),
                      amin)
    log_spec = 10.0 * (jnp.log10(jnp.maximum(S, amin)) - jnp.log10(ref))
    return jnp.maximum(log_spec, -top_db)


class PowerMelDB:
    """Classifier-style mel features: power spectrogram -> slaney mel ->
    dB re max, range [-80, 0] (equivalent of librosa.feature.melspectrogram +
    power_to_db as used in reference classifier.py:220-226; fmax defaults to
    sr/2 there, unlike the synthesis mel's 8 kHz)."""

    def __init__(self, sampling_rate=22050, n_fft=1024, hop_length=256,
                 n_mel_channels=80):
        self.stft = STFT(n_fft, hop_length, n_fft)
        basis = mel_filterbank(sampling_rate, n_fft, n_mel_channels,
                               0.0, sampling_rate / 2)
        self.mel_basis = jnp.asarray(basis)

    def __call__(self, y):
        """(B, T) -> (B, n_mel, n_frames) in [-80, 0] dB."""
        mag = self.stft.magnitude(y)
        power = mag**2
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, power,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return power_to_db(mel, ref_axis=(-2, -1))
