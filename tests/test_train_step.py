"""GAN train-step tests: single device and 8-device data-parallel mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.config import HParams
from gantron_tpu.parallel import make_mesh, shard_batch, shard_state
from gantron_tpu.train.state import create_train_state
from gantron_tpu.train.step import Batch, make_train_steps


def tiny_hp(**over):
    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=48, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=32,
        postnet_n_convolutions=3, noise_size=8, discriminator_dim=32,
        max_decoder_steps=24, use_noise=True, use_labels=False,
        scan_unroll=1,
        batch_size=8,
    ))
    for k, v in over.items():
        hp.add_param(k, v)
    return hp


def synth_batch(hp, B=8, T_in=12, T_out=24, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, hp.n_symbols, (B, T_in)).astype(np.int32)
    text_lengths = rng.randint(T_in // 2, T_in + 1, B).astype(np.int32)
    text_lengths[0] = T_in
    for b in range(B):
        text[b, text_lengths[b]:] = 0
    mels = rng.randn(B, hp.n_mel_channels, T_out).astype(np.float32) * 0.1
    output_lengths = rng.randint(T_out // 2, T_out + 1, B).astype(np.int32)
    output_lengths[0] = T_out
    gate = np.zeros((B, T_out), np.float32)
    for b in range(B):
        mels[b, :, output_lengths[b]:] = 0
        gate[b, output_lengths[b] - 1:] = 1
    return Batch(
        text=jnp.asarray(text), text_lengths=jnp.asarray(text_lengths),
        mels=jnp.asarray(mels), gate=jnp.asarray(gate),
        speaker=jnp.zeros((B,), jnp.int32),
        emotions=jnp.asarray(rng.rand(B, 5), jnp.float32),
        output_lengths=jnp.asarray(output_lengths))


@pytest.fixture(scope="module")
def setup():
    hp = tiny_hp()
    batch = synth_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, d_step, eval_step = make_train_steps(hp, gen, disc, g_tx, d_tx)
    return hp, batch, state, (jax.jit(g_step), jax.jit(d_step),
                              jax.jit(eval_step))


def test_g_step_updates_params(setup):
    hp, batch, state, (g_step, d_step, eval_step) = setup
    before = state.g_params["embedding"]
    state2, metrics, (gen_mel, gen_lengths) = g_step(
        state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    assert int(state2.step) == int(state.step) + 1
    for k in ("generator_loss", "mel_loss", "gate_loss", "attention_loss",
              "adversarial_loss", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    assert gen_mel.shape == batch.mels.shape
    np.testing.assert_array_equal(np.asarray(gen_lengths),
                                  np.asarray(batch.output_lengths))
    assert not np.allclose(np.asarray(before),
                           np.asarray(state2.g_params["embedding"]))
    # Discriminator untouched by a G step.
    d0 = jax.tree.leaves(state.d_params)[0]
    d1 = jax.tree.leaves(state2.d_params)[0]
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_d_step_updates_discriminator(setup):
    hp, batch, state, (g_step, d_step, eval_step) = setup
    _, _, (gen_mel, gen_lengths) = g_step(state, batch, jnp.float32(1e-3),
                                          jnp.float32(10.0))
    state2, metrics = d_step(state, batch.mels, batch.output_lengths,
                             gen_mel, gen_lengths, jnp.float32(7e-4))
    for k in ("discriminator_loss", "real_loss", "fake_loss"):
        assert np.isfinite(float(metrics[k])), k
    d0 = jax.tree.leaves(state.d_params)[0]
    d1 = jax.tree.leaves(state2.d_params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # Generator untouched by a D step.
    np.testing.assert_array_equal(
        np.asarray(state.g_params["embedding"]),
        np.asarray(state2.g_params["embedding"]))


def test_eval_step(setup):
    hp, batch, state, (g_step, d_step, eval_step) = setup
    metrics, out = eval_step(state, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["mel_loss"]))
    assert out[0].shape == batch.mels.shape


def test_gradient_penalty_path():
    hp = tiny_hp(gradient_penalty_lambda=10.0, clipping_value=0)
    batch = synth_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    _, d_step, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    # A random mel stands in for the generated one: the GP path only needs a
    # fake-mel *value*, and skipping the g_step saves a full grad compile.
    gen_mel = jax.random.normal(jax.random.PRNGKey(1), batch.mels.shape) * 0.1
    state2, metrics = jax.jit(d_step)(
        state, batch.mels, batch.output_lengths, gen_mel,
        batch.output_lengths, jnp.float32(7e-4))
    assert float(metrics["gradient_penalty"]) > 0


def test_data_parallel_8dev():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    hp = tiny_hp()
    batch = synth_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, d_step, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)

    mesh = make_mesh((8,))
    sharded_state = shard_state(state, mesh)
    sharded_batch = shard_batch(batch, mesh)

    jit_g = jax.jit(g_step)
    state2, metrics, gen_mel = jit_g(sharded_state, sharded_batch,
                                     jnp.float32(1e-3), jnp.float32(10.0))
    assert np.isfinite(float(metrics["generator_loss"]))

    # DP result must match single-device numerics.
    state2_single, metrics_single, _ = jax.jit(g_step)(
        state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    np.testing.assert_allclose(float(metrics["generator_loss"]),
                               float(metrics_single["generator_loss"]),
                               rtol=2e-4)
    a = np.asarray(state2.g_params["embedding"])
    b = np.asarray(state2_single.g_params["embedding"])
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_bf16_mixed_precision_step():
    """fp16_run maps to bf16 compute with f32 master params."""
    hp = tiny_hp(fp16_run=True)
    batch = synth_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, d_step, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    s2, m, (gm, gl) = jax.jit(g_step)(state, batch, jnp.float32(1e-3),
                                      jnp.float32(10.0))
    assert np.isfinite(float(m["generator_loss"]))
    assert jax.tree.leaves(s2.g_params)[0].dtype == jnp.float32
    s3, dm = jax.jit(d_step)(s2, batch.mels, batch.output_lengths, gm,
                             gl, jnp.float32(7e-4))
    assert np.isfinite(float(dm["discriminator_loss"]))
