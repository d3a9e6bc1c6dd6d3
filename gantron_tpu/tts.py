"""High-level text-to-speech API.

The reference's ``Tacotron2.inference`` accepts a raw string
(model.py:687-689); here the string path is a thin host-side wrapper around
the jit-compiled array API.

    from gantron_tpu.tts import Synthesizer
    synth = Synthesizer.from_checkpoint("out/iter=..ckpt", hp)
    wav = synth.tts("Hello world.")           # Griffin-Lim
    wav = synth.tts("Hello world.", waveglow) # neural vocoder
"""

import json
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gantron_tpu.audio.mel import MelSpectrogram, mel_to_wav_griffin_lim
from gantron_tpu.text import text_to_sequence


def _derive_text_lengths(ids: np.ndarray) -> np.ndarray:
    """Per-row valid lengths of a (B, T) id batch from trailing pad (id 0)
    runs. Symbol id 0 is the pad marker ``_`` and is never emitted by
    ``text_to_sequence`` for real text, so trailing zeros are padding. A row
    with no trailing zeros (or all zeros) gets the full length T."""
    rev_nonzero = (ids[:, ::-1] != 0)
    # argmax of all-False is 0 -> full length, the right degenerate answer.
    return (ids.shape[1] - rev_nonzero.argmax(axis=1)).astype(np.int32)


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

    def load_calibration(self, path_or_json):
        """Attach a measured knob calibration (eval/calibration.py) so
        ``infer_mel(level=...)`` can target absolute factor levels. Takes
        a path to the JSON written by ``scripts/calibrate_knob.py`` (or a
        raw JSON string). Returns self for chaining."""
        from gantron_tpu.eval.calibration import KnobCalibration

        s = path_or_json
        if not s.lstrip().startswith("{"):
            with open(s) as f:
                s = f.read()
        d = json.loads(s)
        # calibrate_knob.py wraps the curve under a "calibration" key;
        # accept either the wrapper document or the bare curve.
        if "calibration" in d and "code_values" not in d:
            d = d["calibration"]
        self.calibration = KnobCalibration.from_json(json.dumps(d))
        return self

    def style_for_level(self, level, seed=0):
        """Calibrated style vector targeting an absolute factor level
        (requires :meth:`load_calibration`): uniform nuisance draw with
        the calibrated code dim pinned to ``code_for_level(level)``."""
        cal = getattr(self, "calibration", None)
        if cal is None:
            raise ValueError(
                "no knob calibration attached; call load_calibration() "
                "with the JSON from scripts/calibrate_knob.py first")
        return cal.style_for_level(level, jax.random.PRNGKey(seed),
                                   self.hp.noise_size)

    def infer_mel(self, text, style=None, emotions=None, speaker=None,
                  seed=0, early_exit=True, text_lengths=None, level=None):
        """Text (str, 1-D ids, or (B, T) ids) -> (mel_postnet (n_mel, L),
        length L). For a (B>1, T) batch, returns a LIST of per-sample
        (mel, L) pairs — every row's decode is returned, not just row 0.

        ``level``: absolute factor level for a calibrated style knob
        (requires :meth:`load_calibration`; mutually exclusive with an
        explicit ``style``).

        ``text_lengths``: optional (B,) true lengths for a PADDED id batch.
        When None they are derived from trailing pad (id 0) runs, so a
        ragged batch padded with ``export.pad_text`` masks correctly by
        default — encoder state and attention never see pad positions
        (reference model.py:675-723 only ever decodes one unpadded text)."""
        if isinstance(text, str):
            ids = np.asarray(text_to_sequence(text, self.hp.text_cleaners),
                             np.int32)[None]
        else:
            ids = np.asarray(text, np.int32)
            if ids.ndim == 1:
                ids = ids[None]
        if text_lengths is None:
            text_lengths = _derive_text_lengths(ids)
        if level is not None:
            if style is not None:
                raise ValueError("pass either style or level, not both")
            style = self.style_for_level(level, seed)
            if ids.shape[0] > 1:
                style = jnp.tile(style, (ids.shape[0], 1, 1))
        key = jax.random.PRNGKey(seed)
        out = self.model.apply(
            self.variables, jnp.asarray(ids), style, emotions, speaker,
            None, early_exit, method=self.model.infer,
            text_lengths=jnp.asarray(text_lengths, jnp.int32),
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


class StreamingSynthesizer:
    """Chunked text->wav for low time-to-first-audio serving.

    The reference synthesizes the whole utterance before any audio exists
    (inference_samples.py:111-124: full decode -> full WaveGlow pass). Here
    the decoder advances ``chunk`` steps at a time (Decoder.infer_segment);
    each new mel segment is vocoded immediately with ``lookback`` frames of
    left context (the postnet and WaveGlow are convolutional, so context
    makes the kept interior match the full-utterance result away from chunk
    boundaries), and the context samples are discarded. Time-to-first-audio
    becomes ~ encode + one segment + one window vocode instead of the whole
    utterance.

    Chunk boundaries are not bit-exact vs. offline synthesis: WaveGlow's
    per-window z draws differ, and its receptive field exceeds any practical
    lookback. A short equal-power crossfade smooths the seams.
    """

    def __init__(self, model, variables, hp, waveglow=None, chunk: int = 40,
                 lookback: int = 16, sigma: float = 0.666,
                 crossfade: int = 128, griffin_lim_iters: int = 30):
        self.model, self.variables, self.hp = model, variables, hp
        self.waveglow = waveglow
        if waveglow is None and lookback < 1:
            # Griffin-Lim's ISTFT yields (T-1)*hop samples per window, so a
            # zero-lookback window is hop samples short of the chunk and
            # the emitted chunks would no longer tile the waveform.
            raise ValueError("Griffin-Lim streaming needs lookback >= 1")
        self.chunk, self.lookback = chunk, lookback
        self.sigma = sigma
        self.crossfade = crossfade
        self.griffin_lim_iters = griffin_lim_iters
        self.mel_fn = MelSpectrogram(
            hp.filter_length, hp.hop_length, hp.win_length,
            hp.n_mel_channels, hp.sampling_rate, hp.mel_fmin, hp.mel_fmax)

        self._encode = jax.jit(lambda v, text, sty, emo, spk, lens, kd, kn:
                               model.apply(
            v, text, sty, emo, spk, lens, method=model.encode_memory,
            rngs={"dropout": kd, "noise": kn}))
        self._init = jax.jit(
            lambda v, memory, cap: model.apply(
                v, memory, cap, method=model.decode_init),
            static_argnums=(2,))
        self._segment = jax.jit(
            lambda v, memory, carry, k, lens: model.apply(
                v, memory, carry, chunk, k, memory_lengths=lens,
                method=model.decode_segment))
        self._postnet = jax.jit(lambda v, mel: model.apply(
            v, mel, method=model.postnet_residual))

        def pipeline(v, memory, carry, tail, k_dec, k_voc, lens):
            """One segment end to end: decode -> postnet window -> vocode.
            The three stages stay separate jits (fusing the decoder scan and
            the 12-flow WaveGlow graph into one program compiles for many
            minutes); dispatch is asynchronous, so the stream loop still
            needs only ONE blocking round-trip per chunk — the wav fetch.
            Per-sync latency dominates streaming on remote-attached devices.
            """
            carry, mel_seg, _, _, lengths, finished = self._segment(
                v, memory, carry, k_dec, lens)
            window = jnp.concatenate([tail, mel_seg], axis=2)
            wav_win = self._vocode(self._postnet(v, window), k_voc)
            # NOT `[..., -lookback:]`: at lookback=0 that negative-index
            # slice returns the FULL window, growing the tail each chunk.
            next_tail = window[:, :, window.shape[2] - lookback:]
            return carry, next_tail, wav_win, lengths, finished

        self._pipeline = pipeline

    def _vocode(self, mel_win, key):
        if self.waveglow is not None:
            return self.waveglow.infer(mel_win, self.sigma, key)
        return mel_to_wav_griffin_lim(mel_win, self.mel_fn,
                                      n_iters=self.griffin_lim_iters,
                                      key=key)

    def stream(self, text, seed: int = 0, max_steps: Optional[int] = None,
               style=None, emotions=None, speaker=None, text_lengths=None):
        """Generator over (B, chunk*K*hop_length) float32 wav chunks; yields
        as soon as each chunk's audio is materialized. ``text``: str or
        (B, T) int32 ids. ``style``/``emotions``/``speaker`` condition the
        generation exactly as in ``Synthesizer.infer_mel`` (a label-trained
        model left unconditioned draws RANDOM emotions per utterance,
        reference model.py:691-692). ``text_lengths``: optional (B,) true
        lengths for a PADDED id batch; derived from trailing pad (id 0)
        runs when None, so ragged streaming batches mask encoder state and
        attention at pad positions. The final ``lengths`` (valid frames per
        sample) are available as ``self.last_lengths`` after exhaustion."""
        hp = self.hp
        if isinstance(text, str):
            ids = np.asarray(text_to_sequence(text, hp.text_cleaners),
                             np.int32)[None]
        else:
            ids = np.asarray(text, np.int32)
            if ids.ndim == 1:
                ids = ids[None]
        if text_lengths is None:
            text_lengths = _derive_text_lengths(ids)
        lens = jnp.asarray(text_lengths, jnp.int32)
        cap = max_steps or hp.max_decoder_steps
        K = getattr(hp, "n_frames_per_step", 1)
        hop = hp.hop_length
        lb = self.lookback
        key = jax.random.PRNGKey(seed)
        kd, kn, kv = (jax.random.fold_in(key, i) for i in range(3))

        memory, k_dec, _ = self._encode(self.variables, jnp.asarray(ids),
                                        style, emotions, speaker, lens,
                                        kd, kn)
        carry = self._init(self.variables, memory, cap)
        B = ids.shape[0]
        tail = jnp.zeros((B, hp.n_mel_channels, lb), memory.dtype)
        held = None  # last xf samples, held back for seam blending
        steps = 0
        xf = min(self.crossfade, lb * hop)
        self.last_lengths = np.full((B,), cap * K, np.int64)
        while steps < cap:
            # The decode segment is a fixed `chunk` steps (static scan
            # shape); when the cap is not a chunk multiple, only the first
            # cap-steps of the final segment are emitted — a stream consumer
            # must never hear audio past the configured cap.
            n_valid = min(self.chunk, cap - steps)
            carry, tail, wav_win, lengths, finished = self._pipeline(
                self.variables, memory, carry, tail, k_dec,
                jax.random.fold_in(kv, steps), lens)
            # ONE blocking round-trip per chunk: wav + stop flag + lengths
            # fetched together (each separate sync costs a full network
            # round-trip on remote-attached devices).
            wav_win_h, lengths_h, finished_h = jax.device_get(
                (wav_win, lengths, finished))
            # Vocoders differ in edge handling (Griffin-Lim's ISTFT yields
            # (T-1)*hop samples, WaveGlow T*hop); shift the kept region so
            # consecutive chunks tile the waveform without gaps.
            shift = max((lb + self.chunk * K) * hop - wav_win_h.shape[1], 0)
            start = max(lb * hop - shift, 0)
            # Frames past a sample's gate stop decode as ZERO log-mels,
            # which vocode as loud broadband noise, not silence
            # (dynamic-range-compressed mels live around -11..0). A live
            # consumer plays chunks as they arrive, so silence them here —
            # per sample, from its stop frame to the window end (covers the
            # gate-to-chunk-boundary gap and, for B>1, samples that finished
            # while others still decode).
            wav_win_h = np.array(wav_win_h)  # device_get can be read-only
            for b in range(B):
                cut = start + (int(lengths_h[b]) - steps * K) * hop
                wav_win_h[b, max(min(cut, wav_win_h.shape[1]), 0):] = 0.0
            wav = wav_win_h[:, start: start + n_valid * K * hop]
            steps += n_valid
            self.last_lengths = np.minimum(np.asarray(lengths_h), cap * K)
            xf = min(xf, start)
            if held is not None and xf:
                # This window's lookback region re-synthesizes the held-back
                # samples; equal-power blend toward the new version so the
                # transition across the seam is continuous.
                t = np.linspace(0.0, 1.0, xf, dtype=np.float32)
                redo = wav_win_h[:, start - xf: start]
                held = held * np.sqrt(1.0 - t) + redo * np.sqrt(t)
                wav = np.concatenate([held, wav], axis=1)
            if xf:
                held = wav[:, -xf:]
                wav = wav[:, :-xf]
            yield wav
            if bool(finished_h):
                break
        if held is not None and xf:
            yield held

    def synthesize(self, text, seed: int = 0,
                   max_steps: Optional[int] = None,
                   style=None, emotions=None, speaker=None,
                   text_lengths=None):
        """Collect the stream; returns (wav (B, T_samples) trimmed to the
        decoded lengths, ttfa_seconds, total_seconds)."""
        import time as _time

        t0 = _time.perf_counter()
        ttfa = None
        chunks = []
        for chunk in self.stream(text, seed=seed, max_steps=max_steps,
                                 style=style, emotions=emotions,
                                 speaker=speaker, text_lengths=text_lengths):
            if ttfa is None:
                ttfa = _time.perf_counter() - t0
            chunks.append(chunk)
        total = _time.perf_counter() - t0
        wav = np.concatenate(chunks, axis=1)
        n = int(self.last_lengths.max()) * self.hp.hop_length
        return wav[:, :n], ttfa, total
