"""Fused Pallas TPU kernel: windowed DFT -> magnitude -> mel -> log-clamp.

The north-star mel featurizer (BASELINE.json): instead of materializing the
(B, T', 2*cutoff) spectrum in HBM between two XLA matmuls, one kernel tile
streams frames through VMEM and performs both MXU matmuls plus the
elementwise magnitude/log stages in a single pass. The windowed Fourier
basis (window folded into the basis, like the reference conv-STFT weights,
stft.py:63-72) and the mel filterbank stay resident in VMEM across the grid.

Frequency/mel dims are zero-padded to lane multiples (128) so every matmul
tiles cleanly onto the MXU; padding columns produce zeros that never affect
the valid outputs (log is only taken on the clamped mel, and clamp(0) ->
log(1e-5) exactly as the reference's dynamic-range compression).

Falls back to interpret mode off-TPU (used by the CPU test suite).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gantron_tpu.audio.filters import hann_window, mel_filterbank, pad_center

LANE = 128
TILE_T = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _constants(filter_length, hop_length, win_length, n_mel_channels,
               sampling_rate, mel_fmin, mel_fmax):
    """Windowed DFT basis and mel weights, lane-padded (numpy, cached)."""
    cutoff = filter_length // 2 + 1
    kp = _round_up(cutoff, LANE)

    n = np.arange(filter_length)
    k = np.arange(cutoff)[:, None]
    omega = 2.0 * np.pi * k * n[None, :] / filter_length
    window = pad_center(hann_window(win_length, np.float64), filter_length)
    cos_b = np.zeros((filter_length, kp))
    sin_b = np.zeros((filter_length, kp))
    cos_b[:, :cutoff] = (np.cos(omega) * window[None, :]).T
    sin_b[:, :cutoff] = (-np.sin(omega) * window[None, :]).T
    basis = np.concatenate([cos_b, sin_b], axis=1)  # (n_fft, 2*kp)

    mp = _round_up(n_mel_channels, LANE)
    mel_w = np.zeros((kp, mp))
    mel_w[:cutoff, :n_mel_channels] = mel_filterbank(
        sampling_rate, filter_length, n_mel_channels, mel_fmin,
        mel_fmax).T
    return (jnp.asarray(basis, jnp.float32), jnp.asarray(mel_w, jnp.float32),
            kp, mp)


def _kernel(frames_ref, basis_ref, melw_ref, out_ref, *, kp):
    frames = frames_ref[0]  # (TILE_T, n_fft)
    spec = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32)
    re = spec[:, :kp]
    im = spec[:, kp:]
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, melw_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.clip(mel, min=1e-5))


def fused_frames_to_mel(frames, basis, mel_w, kp, mp, interpret=False):
    """frames: (B, T', n_fft) windowless frames -> (B, T', mp) log-mel
    (valid mel channels in [:n_mel])."""
    B, T, n_fft = frames.shape
    Tp = _round_up(T, TILE_T)
    if Tp != T:
        frames = jnp.pad(frames, ((0, 0), (0, Tp - T), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, kp=kp),
        grid=(B, Tp // TILE_T),
        in_specs=[
            pl.BlockSpec((1, TILE_T, n_fft), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * kp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, mp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, mp), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, mp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tp * n_fft * 2 * kp + 2 * B * Tp * kp * mp,
            bytes_accessed=4 * (B * Tp * n_fft + n_fft * 2 * kp + kp * mp
                                + B * Tp * mp),
            transcendentals=B * Tp * (kp + mp)),
        interpret=interpret,
    )(frames, basis, mel_w)
    return out[:, :T]


def pallas_mel_spectrogram(y, filter_length=1024, hop_length=256,
                           win_length=1024, n_mel_channels=80,
                           sampling_rate=22050, mel_fmin=0.0,
                           mel_fmax=8000.0, interpret=None):
    """(B, T_samples) in [-1, 1] -> (B, n_mel, n_frames) log-mel.

    Drop-in equivalent of ``MelSpectrogram.mel_spectrogram`` backed by the
    fused kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    basis, mel_w, kp, mp = _constants(filter_length, hop_length, win_length,
                                      n_mel_channels, sampling_rate,
                                      mel_fmin, mel_fmax)
    pad = filter_length // 2
    yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (yp.shape[1] - filter_length) // hop_length + 1
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(filter_length)[None, :])
    frames = yp[:, idx]
    mel = fused_frames_to_mel(frames, basis, mel_w, kp, mp,
                              interpret=interpret)
    return mel[:, :, :n_mel_channels].transpose(0, 2, 1)
