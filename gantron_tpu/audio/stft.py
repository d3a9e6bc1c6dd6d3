"""STFT as MXU matmuls (TPU-native equivalent of the reference conv-STFT).

The reference (stft.py:42-141) runs a Conv1d whose weights are a windowed
Fourier basis. On TPU the same math is expressed as: reflect-pad, frame,
window, and one large ``(frames, n_fft) @ (n_fft, 2*cutoff)`` matmul that XLA
tiles onto the MXU — far better than a generic FFT lowering at these sizes,
and trivially fusible with the downstream mel projection.

All basis matrices are built once in numpy; the jnp methods are pure and
jit-safe.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gantron_tpu.audio.filters import hann_window, pad_center, window_sumsquare


class STFT:
    """Forward/inverse STFT with reflect padding (matches reference semantics:
    stft.py:77-136 — magnitude/phase out, window-sumsquare-corrected inverse).
    """

    def __init__(self, filter_length=1024, hop_length=256, win_length=1024,
                 window="hann"):
        assert filter_length >= win_length
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.window = window
        self.cutoff = filter_length // 2 + 1

        # Real/imag DFT basis, rows = frequency bins (like rfft).
        n = np.arange(filter_length)
        k = np.arange(self.cutoff)[:, None]
        omega = 2.0 * np.pi * k * n[None, :] / filter_length
        fourier = np.vstack([np.cos(omega), -np.sin(omega)])  # (2*cutoff, n_fft)

        scale = filter_length / hop_length
        inverse = np.linalg.pinv(scale * fourier).T  # (2*cutoff, n_fft)

        if window is not None:
            fft_window = pad_center(hann_window(win_length, np.float64),
                                    filter_length)
            fourier = fourier * fft_window[None, :]
            inverse = inverse * fft_window[None, :]
            self._win_np = fft_window
        else:
            self._win_np = np.ones(filter_length)

        # Transposed for right-multiplication: frames @ basis.
        self.forward_basis = jnp.asarray(fourier.T, dtype=jnp.float32)
        self.inverse_basis = jnp.asarray(inverse, dtype=jnp.float32)

    # -- framing ------------------------------------------------------------
    def n_frames(self, num_samples: int) -> int:
        return (num_samples + 2 * (self.filter_length // 2)
                - self.filter_length) // self.hop_length + 1

    def frame(self, y):
        """(B, T) -> (B, n_frames, filter_length) with reflect padding."""
        pad = self.filter_length // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = (y.shape[1] - self.filter_length) // self.hop_length + 1
        idx = (np.arange(n_frames)[:, None] * self.hop_length
               + np.arange(self.filter_length)[None, :])
        return y[:, idx]

    # -- forward ------------------------------------------------------------
    def transform(self, y):
        """(B, T) -> magnitude, phase of shape (B, cutoff, n_frames)."""
        frames = self.frame(y)
        spec = jnp.einsum("btf,fk->btk", frames, self.forward_basis,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        real = spec[..., : self.cutoff]
        imag = spec[..., self.cutoff :]
        magnitude = jnp.sqrt(real**2 + imag**2)
        phase = jnp.arctan2(imag, real)
        # (B, n_frames, cutoff) -> (B, cutoff, n_frames), reference layout
        return magnitude.transpose(0, 2, 1), phase.transpose(0, 2, 1)

    def magnitude(self, y):
        """Magnitude only — lets XLA skip the phase computation entirely."""
        frames = self.frame(y)
        spec = jnp.einsum("btf,fk->btk", frames, self.forward_basis,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        real = spec[..., : self.cutoff]
        imag = spec[..., self.cutoff :]
        return jnp.sqrt(real**2 + imag**2).transpose(0, 2, 1)

    # -- inverse ------------------------------------------------------------
    def inverse(self, magnitude, phase):
        """(B, cutoff, T') x2 -> (B, 1, T) reconstructed signal."""
        n_frames = magnitude.shape[-1]
        coeffs = jnp.concatenate(
            [magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)], axis=1)
        # (B, 2*cutoff, T') -> per-frame time snippets (B, T', n_fft)
        frames_rec = jnp.einsum("bkt,kf->btf", coeffs, self.inverse_basis,
                                preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

        # Overlap-add.
        total = self.filter_length + self.hop_length * (n_frames - 1)
        idx = (np.arange(n_frames)[:, None] * self.hop_length
               + np.arange(self.filter_length)[None, :])
        sig = jnp.zeros((frames_rec.shape[0], total), frames_rec.dtype)
        sig = sig.at[:, idx.reshape(-1)].add(
            frames_rec.reshape(frames_rec.shape[0], -1))

        # Window sum-square correction (remove modulation effects).
        wss = window_sumsquare(self.win_length, n_frames, self.hop_length,
                               self.filter_length)
        tiny = np.finfo(np.float32).tiny
        wss_safe = np.where(wss > tiny, wss, 1.0)
        sig = jnp.where(jnp.asarray(wss > tiny)[None, :],
                        sig / jnp.asarray(wss_safe)[None, :], sig)
        sig = sig * (float(self.filter_length) / self.hop_length)

        pad = self.filter_length // 2
        return sig[:, pad:-pad][:, None, :]


def griffin_lim(magnitudes, stft_fn: STFT, n_iters: int = 30, key=None):
    """Phase recovery by iterative STFT projection (reference:
    audio_processing.py:59-75). ``magnitudes``: (B, cutoff, T')."""
    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, magnitudes.shape, minval=-np.pi,
                                maxval=np.pi, dtype=jnp.float32)
    signal = stft_fn.inverse(magnitudes, angles)[:, 0]

    def body(_, signal):
        _, angles = stft_fn.transform(signal)
        return stft_fn.inverse(magnitudes, angles)[:, 0]

    return jax.lax.fori_loop(0, n_iters, body, signal)
