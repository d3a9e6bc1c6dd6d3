"""Audio DSP tests.

The STFT is validated against two independent oracles: numpy's rfft (direct
math) and torch.stft (the backend the reference's conv-STFT is equivalent
to). The mel chain is validated structurally and for round-trip consistency.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.audio import (STFT, MelSpectrogram, griffin_lim,
                               mel_filterbank, window_sumsquare)
from gantron_tpu.audio.filters import hann_window


def _test_signal(n=22050, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 22050.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.3 * np.sin(2 * np.pi * 1000 * t)
           + 0.05 * rng.randn(n))
    return np.clip(sig, -1, 1).astype(np.float32)


def test_stft_matches_numpy_rfft():
    y = _test_signal()
    stft = STFT(1024, 256, 1024)
    mag, phase = stft.transform(jnp.asarray(y)[None])
    mag = np.asarray(mag)[0]

    # Independent oracle: reflect pad + frame + window + rfft.
    pad = 512
    yp = np.pad(y, pad, mode="reflect")
    win = hann_window(1024, np.float64)
    n_frames = (len(yp) - 1024) // 256 + 1
    ref = np.empty((513, n_frames))
    for tix in range(n_frames):
        fr = yp[tix * 256 : tix * 256 + 1024] * win
        ref[:, tix] = np.abs(np.fft.rfft(fr))

    assert mag.shape == ref.shape
    np.testing.assert_allclose(mag, ref, atol=2e-3, rtol=1e-3)


def test_stft_matches_torch_stft():
    torch = pytest.importorskip("torch")
    y = _test_signal(n=10000, seed=1)
    stft = STFT(1024, 256, 1024)
    mag, _ = stft.transform(jnp.asarray(y)[None])
    mag = np.asarray(mag)[0]

    win = torch.hann_window(1024, periodic=True, dtype=torch.float64)
    t_out = torch.stft(torch.from_numpy(y).double(), n_fft=1024,
                       hop_length=256, win_length=1024, window=win,
                       center=True, pad_mode="reflect", return_complex=True)
    t_mag = t_out.abs().numpy()
    assert mag.shape == t_mag.shape
    np.testing.assert_allclose(mag, t_mag, atol=2e-3, rtol=1e-3)


def test_stft_inverse_roundtrip():
    y = _test_signal(n=8192, seed=2)
    stft = STFT(1024, 256, 1024)
    mag, phase = stft.transform(jnp.asarray(y)[None])
    rec = np.asarray(stft.inverse(mag, phase))[0, 0]
    # Edges are imperfect (reflect padding + window taper); check interior.
    interior = slice(1024, len(y) - 1024)
    np.testing.assert_allclose(rec[interior], y[interior], atol=5e-3)


def test_mel_filterbank_structure():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # Every filter has support, peaks are strictly increasing in frequency.
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 1)
    assert fb[:, 0].sum() == 0 or fb[0, 0] >= 0
    # Filters above fmax (8kHz -> bin 372) are zero.
    bin_8k = int(np.ceil(8000 / (22050 / 2) * 512))
    assert fb[:, bin_8k + 2 :].sum() < 1e-6
    # Slaney normalization: filter areas are roughly equal and nonzero.
    areas = fb.sum(axis=1)
    assert np.all(areas > 0)


def test_mel_spectrogram_shape_and_range():
    y = _test_signal()
    mel_fn = MelSpectrogram()
    mel = np.asarray(mel_fn(jnp.asarray(y)[None]))
    n_frames = len(y) // 256 + 1
    assert mel.shape == (1, 80, n_frames)
    # log-clamped at log(1e-5)
    assert mel.min() >= np.log(1e-5) - 1e-5
    assert mel.max() < 5.0


def test_mel_spectrogram_jits():
    y = jnp.asarray(_test_signal(n=4096))
    mel_fn = MelSpectrogram()
    jitted = jax.jit(mel_fn.mel_spectrogram)
    out1 = jitted(y[None])
    out2 = mel_fn(y[None])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_window_sumsquare_matches_naive():
    wss = window_sumsquare(1024, 40, 256, 1024)
    assert wss.shape == (1024 + 256 * 39,)
    # Hann with 75% overlap sums to ~1.5 in the steady state.
    steady = wss[2048:-2048]
    np.testing.assert_allclose(steady, 1.5, atol=1e-3)


def test_griffin_lim_reduces_error():
    y = _test_signal(n=8192, seed=3)
    stft = STFT(1024, 256, 1024)
    mag, _ = stft.transform(jnp.asarray(y)[None])
    rec = np.asarray(griffin_lim(mag, stft, n_iters=5,
                                 key=jax.random.PRNGKey(0)))[0]
    # Reconstruction magnitude spectrum should approximate the target.
    mag2, _ = stft.transform(jnp.asarray(rec)[None])
    err = np.abs(np.asarray(mag2) - np.asarray(mag)).mean()
    scale = np.abs(np.asarray(mag)).mean()
    assert err / scale < 0.5
