"""Misc audio utilities (reference: utils.py:34-44, 195-223)."""

import os
from typing import Optional

import numpy as np


def get_mel_from_audio(path, hp=None):
    """Wav file -> synthesis-style log-mel (n_mel, T) numpy
    (reference utils.py:34-44)."""
    from gantron_tpu.audio.mel import MelSpectrogram
    from gantron_tpu.config import HParams
    from gantron_tpu.data.wav import load_wav

    hp = hp or HParams()
    mel_fn = MelSpectrogram(hp.filter_length, hp.hop_length, hp.win_length,
                            hp.n_mel_channels, hp.sampling_rate, hp.mel_fmin,
                            hp.mel_fmax)
    wav = load_wav(path, hp.sampling_rate)
    return np.asarray(mel_fn(wav[None]))[0]


def mel_to_audio(base_path, waveglow_path: Optional[str] = None,
                 randomize=True, force_create=False, hp=None):
    """Vocode every ``.npy`` mel in a folder to ``.wav``
    (reference utils.py:195-223). Uses WaveGlow when a checkpoint is given,
    Griffin-Lim otherwise."""
    import random

    import jax
    import jax.numpy as jnp

    from gantron_tpu.audio.mel import MelSpectrogram, mel_to_wav_griffin_lim
    from gantron_tpu.config import HParams
    from gantron_tpu.data.wav import write_wav

    hp = hp or HParams()
    waveglow = None
    if waveglow_path:
        from gantron_tpu.models.waveglow import load_waveglow

        waveglow = load_waveglow(waveglow_path)
    mel_fn = MelSpectrogram(hp.filter_length, hp.hop_length, hp.win_length,
                            hp.n_mel_channels, hp.sampling_rate, hp.mel_fmin,
                            hp.mel_fmax)

    names = [p for p in os.listdir(base_path) if p.endswith(".npy")]
    if randomize:
        random.shuffle(names)
    written = []
    for i, name in enumerate(names):
        # Split on the extension, not the first dot: sampled mel names embed
        # rounded emotion floats ('0-3-0.6,0,....npy') whose dots are data.
        out_path = os.path.join(base_path, name[:-len(".npy")] + ".wav")
        if os.path.exists(out_path) and not force_create:
            continue
        mel = np.load(os.path.join(base_path, name), allow_pickle=True)
        if waveglow is not None:
            wav = np.asarray(waveglow.infer(jnp.asarray(mel)[None],
                                            sigma=0.666))[0]
        else:
            wav = np.asarray(mel_to_wav_griffin_lim(
                jnp.asarray(mel)[None], mel_fn,
                key=jax.random.PRNGKey(i)))[0]
        write_wav(out_path, wav, hp.sampling_rate)
        written.append(out_path)
    return written
