"""Streaming synthesis (segmented decode + chunked vocoding, tts.py
StreamingSynthesizer). The reference has no streaming path — it synthesizes
the full utterance before any audio exists (inference_samples.py:111-124)."""

import numpy as np

import jax
import jax.numpy as jnp

from gantron_tpu.tts import StreamingSynthesizer
from test_model import init_and_apply, make_batch, tiny_hp


def _setup(**over):
    hp = tiny_hp(**over)
    batch = make_batch(hp)
    model, variables, _ = init_and_apply(hp, batch, train=False)
    return hp, model, variables, batch[0][:1]


def test_segmented_decode_is_chunk_size_invariant():
    """Per-step keys derive from the absolute step index, so decoding in
    4-step segments must produce bit-identical mels to 8-step segments."""
    hp, model, variables, text = _setup()
    k = jax.random.PRNGKey(3)
    memory, k_dec, _ = model.apply(
        variables, text, method=model.encode_memory,
        rngs={"dropout": jax.random.fold_in(k, 0),
              "noise": jax.random.fold_in(k, 1)})

    def run(chunk, n_chunks):
        carry = model.apply(variables, memory, 40, method=model.decode_init)
        segs = []
        for _ in range(n_chunks):
            carry, mel_seg, *_ = model.apply(
                variables, memory, carry, chunk, k_dec,
                method=model.decode_segment)
            segs.append(np.asarray(mel_seg))
        return np.concatenate(segs, axis=2)

    np.testing.assert_allclose(run(4, 4), run(8, 2), atol=1e-5)


def test_streaming_synthesize_ttfa_and_shape():
    hp, model, variables, text = _setup(max_decoder_steps=24)
    synth = StreamingSynthesizer(model, variables, hp, waveglow=None,
                                 chunk=8, lookback=4, crossfade=64,
                                 griffin_lim_iters=2)
    chunks = list(synth.stream(np.asarray(text), seed=0))
    assert len(chunks) >= 2  # streamed, not monolithic
    total = sum(c.shape[1] for c in chunks)
    # All emitted samples are whole segments: 24 steps * hop each at cap.
    assert total % hp.hop_length == 0
    assert total <= 24 * hp.hop_length
    assert all(c.dtype == np.float32 for c in chunks)

    wav, ttfa, total_s = synth.synthesize(np.asarray(text), seed=0)
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert 0 < ttfa <= total_s
    assert wav.shape[1] <= int(synth.last_lengths.max()) * hp.hop_length


def test_streaming_gate_stop_matches_cap_behavior():
    """With an untrained model the gate rarely fires; the stream must stop
    at the cap and report cap-length outputs."""
    hp, model, variables, text = _setup(max_decoder_steps=16)
    synth = StreamingSynthesizer(model, variables, hp, waveglow=None,
                                 chunk=8, lookback=4, crossfade=0,
                                 griffin_lim_iters=2)
    chunks = list(synth.stream(np.asarray(text), seed=1))
    total = sum(c.shape[1] for c in chunks)
    assert total == 16 * hp.hop_length


def test_streaming_never_emits_past_cap():
    """cap NOT a multiple of chunk: the final segment still decodes a full
    chunk (static scan shape) but only cap-worth of audio may be emitted,
    and last_lengths must clamp at the cap."""
    hp, model, variables, text = _setup(max_decoder_steps=20)
    synth = StreamingSynthesizer(model, variables, hp, waveglow=None,
                                 chunk=8, lookback=4, crossfade=0,
                                 griffin_lim_iters=2)
    chunks = list(synth.stream(np.asarray(text), seed=1))  # 8+8+4 steps
    total = sum(c.shape[1] for c in chunks)
    assert total == 20 * hp.hop_length
    assert int(synth.last_lengths.max()) <= 20


def test_streaming_griffin_lim_requires_lookback():
    import pytest

    hp, model, variables, _ = _setup()
    with pytest.raises(ValueError):
        StreamingSynthesizer(model, variables, hp, waveglow=None, lookback=0)


def test_streaming_accepts_conditioning():
    """A label-conditioned model must stream with the CALLER's emotion
    vector (unconditioned it draws random emotions, reference
    model.py:691-692): same emotions -> same audio, different -> different."""
    hp, model, variables, text = _setup(
        use_labels=True, use_intended_labels=True, vesus_path="x",
        max_decoder_steps=16)
    synth = StreamingSynthesizer(model, variables, hp, waveglow=None,
                                 chunk=8, lookback=4, crossfade=0,
                                 griffin_lim_iters=2)
    e1 = jnp.asarray([[1.0, 0, 0, 0, 0]])
    e2 = jnp.asarray([[0, 0, 0, 0, 1.0]])
    spk = jnp.zeros((1,), jnp.int32)
    a1, _, _ = synth.synthesize(np.asarray(text), seed=0, emotions=e1,
                                speaker=spk)
    a2, _, _ = synth.synthesize(np.asarray(text), seed=0, emotions=e1,
                                speaker=spk)
    b, _, _ = synth.synthesize(np.asarray(text), seed=0, emotions=e2,
                               speaker=spk)
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, b)


def test_streaming_lookback_zero_with_waveglow():
    """lookback=0 must keep an EMPTY tail (a `[..., -0:]` slice would
    return the full window, growing it each chunk, recompiling the
    postnet/vocoder jits per chunk, and re-emitting the previous chunk's
    audio)."""
    from gantron_tpu.models.waveglow import (WaveGlow, WaveGlowConfig,
                                             random_params)

    hp, model, variables, text = _setup(
        max_decoder_steps=8, n_mel_channels=8, hop_length=8)
    cfg = WaveGlowConfig(n_mel_channels=8, n_flows=2, n_group=4,
                         n_early_every=4, n_early_size=1, n_layers=1,
                         n_channels=8, kernel_size=3, upsample_kernel=16,
                         upsample_stride=8)
    wg = WaveGlow(cfg, random_params(jax.random.PRNGKey(0), cfg))
    synth = StreamingSynthesizer(model, variables, hp, waveglow=wg,
                                 chunk=4, lookback=0, crossfade=0)
    # The pipeline must hand back an EMPTY next-tail, not the full window.
    k = jax.random.PRNGKey(1)
    lens = jnp.full((text.shape[0],), text.shape[1], jnp.int32)
    memory, k_dec, _ = synth._encode(variables, jnp.asarray(text), None,
                                     None, None, lens, k, k)
    carry = synth._init(variables, memory, 8)
    _, next_tail, wav_win, _, _ = synth._pipeline(
        variables, memory, carry, jnp.zeros((1, 8, 0), memory.dtype),
        k_dec, k, lens)
    assert next_tail.shape == (1, 8, 0)
    assert wav_win.shape == (1, 4 * hp.hop_length)
    # And the stream emits constant-width chunks that tile the cap.
    chunks = list(synth.stream(np.asarray(text), seed=1))
    assert len(chunks) == 2
    assert all(c.shape == (1, 4 * hp.hop_length) for c in chunks)


def test_streaming_silences_post_stop_frames():
    """Frames between a sample's gate stop and the chunk boundary decode as
    zero log-mels, which VOCODE as loud noise — the stream must emit
    silence there (a live consumer has already played the chunk before any
    trim could happen)."""
    hp, model, variables, text = _setup(max_decoder_steps=16,
                                        gate_threshold=0.0)  # stop at step 1
    synth = StreamingSynthesizer(model, variables, hp, waveglow=None,
                                 chunk=8, lookback=2, crossfade=0,
                                 griffin_lim_iters=2)
    chunks = list(synth.stream(np.asarray(text), seed=0))
    assert len(chunks) == 1  # finished in the first chunk
    wav = chunks[0]
    assert int(synth.last_lengths[0]) == 1
    assert np.any(wav[0, : hp.hop_length] != 0.0)
    np.testing.assert_array_equal(wav[0, hp.hop_length:], 0.0)
