"""High-level text-to-speech API.

The reference's ``Tacotron2.inference`` accepts a raw string
(model.py:687-689); here the string path is a thin host-side wrapper around
the jit-compiled array API.

    from gantron_tpu.tts import Synthesizer
    synth = Synthesizer.from_checkpoint("out/iter=..ckpt", hp)
    wav = synth.tts("Hello world.")           # Griffin-Lim
    wav = synth.tts("Hello world.", waveglow) # neural vocoder
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gantron_tpu.audio.mel import MelSpectrogram, mel_to_wav_griffin_lim
from gantron_tpu.text import text_to_sequence


class Synthesizer:
    def __init__(self, model, variables, hp):
        self.model = model
        self.variables = variables
        self.hp = hp
        self.mel_fn = MelSpectrogram(
            hp.filter_length, hp.hop_length, hp.win_length,
            hp.n_mel_channels, hp.sampling_rate, hp.mel_fmin, hp.mel_fmax)

    @classmethod
    def from_checkpoint(cls, checkpoint_path, hp):
        from gantron_tpu.utils.loading import load_generator

        model, variables = load_generator(checkpoint_path, hp)
        return cls(model, variables, hp)

    def infer_mel(self, text, style=None, emotions=None, speaker=None,
                  seed=0, early_exit=True):
        """Text (str, 1-D ids, or (B, T) ids) -> (mel_postnet (n_mel, L),
        length L). For a (B>1, T) batch, returns a LIST of per-sample
        (mel, L) pairs — every row's decode is returned, not just row 0."""
        if isinstance(text, str):
            ids = np.asarray(text_to_sequence(text, self.hp.text_cleaners),
                             np.int32)[None]
        else:
            ids = np.asarray(text, np.int32)
            if ids.ndim == 1:
                ids = ids[None]
        key = jax.random.PRNGKey(seed)
        out = self.model.apply(
            self.variables, jnp.asarray(ids), style, emotions, speaker,
            None, early_exit, method=self.model.infer,
            rngs={"dropout": jax.random.fold_in(key, 0),
                  "noise": jax.random.fold_in(key, 1)})
        mels = np.asarray(out[1])
        lengths = np.asarray(out[4])
        if ids.shape[0] == 1:
            L = int(lengths[0])
            return mels[0, :, :L], L
        return [(mels[b, :, :int(lengths[b])], int(lengths[b]))
                for b in range(ids.shape[0])]

    def export(self, path, batch_size=1, text_len=96, max_steps=None,
               waveglow=None, platforms=None) -> int:
        """Serialize this model's inference graph (weights baked in) to a
        standalone ``jax.export`` artifact — see gantron_tpu/export.py."""
        from gantron_tpu.export import export_tts

        return export_tts(self.model, self.variables, path,
                          batch_size=batch_size, text_len=text_len,
                          max_steps=max_steps, waveglow=waveglow,
                          platforms=platforms)

    def tts(self, text, waveglow=None, style=None, emotions=None,
            speaker=None, seed=0, sigma=0.666,
            griffin_lim_iters=30) -> np.ndarray:
        """Text -> float32 waveform at ``hp.sampling_rate`` (one utterance;
        use infer_mel + a vocoder directly for batched synthesis)."""
        result = self.infer_mel(text, style, emotions, speaker, seed)
        if isinstance(result, list):
            raise ValueError("tts() synthesizes one utterance; pass batched "
                             "ids to infer_mel() and vocode per sample")
        mel, _ = result
        if waveglow is not None:
            return np.asarray(waveglow.infer(
                jnp.asarray(mel)[None], sigma,
                jax.random.PRNGKey(seed)))[0]
        return np.asarray(mel_to_wav_griffin_lim(
            jnp.asarray(mel)[None], self.mel_fn, n_iters=griffin_lim_iters,
            key=jax.random.PRNGKey(seed)))[0]
