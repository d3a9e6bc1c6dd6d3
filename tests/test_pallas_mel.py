"""Fused Pallas mel kernel vs the jnp reference pipeline (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np

import jax.numpy as jnp

from gantron_tpu.audio import MelSpectrogram
from gantron_tpu.ops.pallas_mel import pallas_mel_spectrogram


def test_fused_mel_matches_reference_pipeline():
    rng = np.random.RandomState(0)
    y = np.clip(rng.randn(2, 8192) * 0.2, -1, 1).astype(np.float32)

    ref = np.asarray(MelSpectrogram()(jnp.asarray(y)))
    fused = np.asarray(pallas_mel_spectrogram(jnp.asarray(y),
                                              interpret=True))

    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, atol=2e-3)


def test_fused_mel_nonmultiple_frame_count():
    rng = np.random.RandomState(1)
    # 5000 samples -> 20 frames: not a multiple of the 128 tile.
    y = np.clip(rng.randn(1, 5000) * 0.2, -1, 1).astype(np.float32)
    ref = np.asarray(MelSpectrogram()(jnp.asarray(y)))
    fused = np.asarray(pallas_mel_spectrogram(jnp.asarray(y),
                                              interpret=True))
    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, atol=2e-3)
