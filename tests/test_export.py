"""Serving export round-trip: jax.export artifact vs direct model apply."""

import numpy as np

import jax
import jax.numpy as jnp

from gantron_tpu.export import export_tts, load_exported, make_infer_fn, \
    pad_text
from gantron_tpu.models import Tacotron2

from test_train_step import tiny_hp


def _init_model(hp, B, T_in):
    model = Tacotron2(hp)
    text = jnp.ones((B, T_in), jnp.int32)
    mels = jnp.zeros((B, hp.n_mel_channels, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        text, jnp.full((B,), T_in, jnp.int32), mels,
        jnp.zeros((B,), jnp.int32), jnp.zeros((B, 5)),
        jnp.full((B,), 8, jnp.int32), train=False)
    return model, variables


def test_export_roundtrip_matches_direct(tmp_path):
    hp = tiny_hp(max_decoder_steps=10)
    B, T_in = 2, 12
    model, variables = _init_model(hp, B, T_in)

    path = str(tmp_path / "tts.stablehlo")
    nbytes = export_tts(model, variables, path, batch_size=B, text_len=T_in,
                        platforms=("cpu",))
    assert nbytes > 0

    rng = np.random.RandomState(0)
    text = pad_text(rng.randint(1, hp.n_symbols, (B, 10)), T_in)
    tl = jnp.full((B,), 10, jnp.int32)
    key = jax.random.PRNGKey(7)

    serve = load_exported(path)
    mel_served, len_served = serve(jnp.asarray(text), tl, key)

    fn, conditioned = make_infer_fn(model, variables)
    assert not conditioned
    mel_direct, len_direct = fn(jnp.asarray(text), tl, key)

    np.testing.assert_array_equal(np.asarray(len_served),
                                  np.asarray(len_direct))
    np.testing.assert_allclose(np.asarray(mel_served),
                               np.asarray(mel_direct), rtol=1e-5, atol=1e-5)
    assert mel_served.shape == (B, hp.n_mel_channels, hp.max_decoder_steps)


def test_export_conditioned_signature(tmp_path):
    hp = tiny_hp(max_decoder_steps=8, use_labels=True,
                 vesus_path=str(tmp_path), encoder_inputs=False)
    B, T_in = 2, 8
    model, variables = _init_model(hp, B, T_in)

    path = str(tmp_path / "tts_vesus.stablehlo")
    export_tts(model, variables, path, batch_size=B, text_len=T_in,
               platforms=("cpu",))
    serve = load_exported(path)
    text = pad_text(np.ones((B, 6), np.int32), T_in)
    emotions = jnp.asarray(np.eye(5, dtype=np.float32)[:B] )
    speaker = jnp.zeros((B,), jnp.int32)
    mel, lengths = serve(jnp.asarray(text), jnp.full((B,), 6, jnp.int32),
                         jax.random.PRNGKey(0), emotions, speaker)
    assert np.isfinite(np.asarray(mel)).all()
    assert mel.shape[0] == B


def test_export_polymorphic_serves_any_shape(tmp_path):
    """One artifact (batch_size=None, text_len=None) serves multiple call
    shapes and matches the direct model output at each of them."""
    hp = tiny_hp(max_decoder_steps=10)
    model, variables = _init_model(hp, 2, 12)

    path = str(tmp_path / "tts_poly.stablehlo")
    nbytes = export_tts(model, variables, path, batch_size=None,
                        text_len=None, platforms=("cpu",))
    assert nbytes > 0
    serve = load_exported(path)
    fn, _ = make_infer_fn(model, variables)

    rng = np.random.RandomState(3)
    key = jax.random.PRNGKey(11)
    for B, T_in in ((1, 10), (3, 14)):
        text = jnp.asarray(rng.randint(1, hp.n_symbols, (B, T_in)), jnp.int32)
        tl = jnp.full((B,), T_in, jnp.int32)
        mel_served, len_served = serve(text, tl, key)
        mel_direct, len_direct = fn(text, tl, key)
        np.testing.assert_array_equal(np.asarray(len_served),
                                      np.asarray(len_direct))
        np.testing.assert_allclose(np.asarray(mel_served),
                                   np.asarray(mel_direct),
                                   rtol=1e-5, atol=1e-5)
        assert mel_served.shape == (B, hp.n_mel_channels,
                                    hp.max_decoder_steps)


def test_pad_text_rejects_overflow():
    import pytest

    with pytest.raises(ValueError):
        pad_text(np.ones((1, 20), np.int32), 10)


def test_export_quantized_per_platform(tmp_path):
    """quantized_inference exports resolve Pallas-vs-XLA per LOWERING
    platform (lax.platform_dependent in ops/quant.py matmul_rhs): a
    TPU-only artifact exports from this CPU host (carrying the int8 Pallas
    kernel), a CPU-only artifact serves here through the XLA dequant path
    and matches the direct model, and a multi-platform request fails with
    a clear error instead of a lowering crash."""
    import pytest

    # 32-dim RNNs -> 128-wide gate matrices, so the Pallas tile picker
    # accepts them and the platform_dependent branch is actually taken.
    hp = tiny_hp(max_decoder_steps=8, attention_rnn_dim=32,
                 decoder_rnn_dim=32, quantized_inference=True)
    B, T_in = 2, 10
    model, variables = _init_model(hp, B, T_in)

    # Default for a quantized model is TPU-only — exports fine from CPU.
    assert export_tts(model, variables, str(tmp_path / "tts_q_tpu.shlo"),
                      batch_size=B, text_len=T_in) > 0

    with pytest.raises(ValueError, match="single-platform"):
        export_tts(model, variables, str(tmp_path / "tts_q_multi.shlo"),
                   batch_size=B, text_len=T_in, platforms=("tpu", "cpu"))

    path = str(tmp_path / "tts_q_cpu.shlo")
    assert export_tts(model, variables, path, batch_size=B, text_len=T_in,
                      platforms=("cpu",)) > 0
    serve = load_exported(path)
    key = jax.random.PRNGKey(3)
    text = pad_text(np.ones((B, 7), np.int32), T_in)
    tl = jnp.full((B,), 7, jnp.int32)
    mel_served, len_served = serve(jnp.asarray(text), tl, key)

    fn, _ = make_infer_fn(model, variables)
    mel_direct, len_direct = fn(jnp.asarray(text), tl, key)
    np.testing.assert_array_equal(np.asarray(len_served),
                                  np.asarray(len_direct))
    np.testing.assert_allclose(np.asarray(mel_served),
                               np.asarray(mel_direct), rtol=1e-5, atol=1e-5)
