"""Tacotron2 generator + discriminator model tests (shapes, masking, jit)."""

import numpy as np

import jax
import jax.numpy as jnp

from gantron_tpu.config import HParams
from gantron_tpu.losses import tacotron2_loss
from gantron_tpu.models import (Discriminator, LinearDiscriminator, Tacotron2)


def tiny_hp(**over):
    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=48, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=32,
        postnet_n_convolutions=3, noise_size=8, discriminator_dim=32,
        max_decoder_steps=40, use_noise=True, use_labels=False,
        scan_unroll=2,
        speakers_embedding=8,
    ))
    for k, v in over.items():
        hp.add_param(k, v)
    return hp


def make_batch(hp, B=2, T_in=11, T_out=24, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, hp.n_symbols, (B, T_in)).astype(np.int32)
    text_lengths = np.array([T_in, T_in - 4], np.int32)
    text[1, text_lengths[1]:] = 0
    mels = rng.randn(B, hp.n_mel_channels, T_out).astype(np.float32)
    output_lengths = np.array([T_out, T_out - 6], np.int32)
    mels[1, :, output_lengths[1]:] = 0.0
    gate = np.zeros((B, T_out), np.float32)
    for b in range(B):
        gate[b, output_lengths[b] - 1:] = 1.0
    speaker = np.zeros((B,), np.int32)
    emotions = rng.rand(B, 5).astype(np.float32)
    return (jnp.asarray(text), jnp.asarray(text_lengths), jnp.asarray(mels),
            jnp.asarray(speaker), jnp.asarray(emotions),
            jnp.asarray(output_lengths), jnp.asarray(gate))


def init_and_apply(hp, batch, train=True):
    model = Tacotron2(hp)
    text, tl, mels, spk, emo, ol, _ = batch
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    variables = model.init(rngs, text, tl, mels, spk, emo, ol, train=False)
    out, _ = model.apply(
        variables, text, tl, mels, spk, emo, ol, train=train,
        rngs={"dropout": jax.random.PRNGKey(3),
              "noise": jax.random.PRNGKey(4)},
        mutable=["batch_stats"])
    return model, variables, out


def test_forward_shapes_vanilla():
    hp = tiny_hp()
    batch = make_batch(hp)
    _, _, out = init_and_apply(hp, batch)
    mel, mel_post, gates, align = out
    B, T_in, T_out = 2, 11, 24
    assert mel.shape == (B, hp.n_mel_channels, T_out)
    assert mel_post.shape == (B, hp.n_mel_channels, T_out)
    assert gates.shape == (B, T_out)
    assert align.shape == (B, T_out, T_in)
    # Alignments are a distribution over valid symbols only.
    a = np.asarray(align)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
    assert a[1, :, 7:].sum() == 0  # masked symbols get zero attention


def test_output_masking():
    hp = tiny_hp()
    batch = make_batch(hp)
    _, _, out = init_and_apply(hp, batch)
    mel, mel_post, gates, _ = out
    ol = np.asarray(batch[5])
    assert np.all(np.asarray(mel)[1, :, ol[1]:] == 0)
    assert np.all(np.asarray(mel_post)[1, :, ol[1]:] == 0)
    assert np.all(np.asarray(gates)[1, ol[1]:] == 1e3)


def test_forward_vesus_conditioning_paths():
    for encoder_inputs in (False, True):
        hp = tiny_hp(vesus_path="/data/vesus", use_labels=True,
                     encoder_inputs=encoder_inputs)
        batch = make_batch(hp)
        _, _, out = init_and_apply(hp, batch)
        assert out[0].shape == (2, hp.n_mel_channels, 24)


def test_loss_finite_and_positive():
    hp = tiny_hp()
    batch = make_batch(hp)
    _, _, out = init_and_apply(hp, batch)
    text, tl, mels, spk, emo, ol, gate = batch
    mel_l, gate_l, attn_l = tacotron2_loss(out, (mels, gate), tl, ol)
    for v in (mel_l, gate_l, attn_l):
        v = float(v)
        assert np.isfinite(v) and v > 0


def test_inference_shapes_and_gate_stop():
    hp = tiny_hp()
    batch = make_batch(hp)
    model, variables, _ = init_and_apply(hp, batch)
    text = batch[0][:1]
    out = model.apply(
        variables, text, method=model.infer,
        rngs={"dropout": jax.random.PRNGKey(5),
              "noise": jax.random.PRNGKey(6)})
    mel, mel_post, gates, align, lengths = out
    S = hp.max_decoder_steps
    assert mel.shape == (1, hp.n_mel_channels, S)
    assert gates.shape == (1, S)
    assert align.shape == (1, S, text.shape[1])
    assert 1 <= int(lengths[0]) <= S


def test_teacher_forcing_jits_and_grads():
    hp = tiny_hp()
    batch = make_batch(hp)
    model = Tacotron2(hp)
    text, tl, mels, spk, emo, ol, gate = batch
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    variables = model.init(rngs, text, tl, mels, spk, emo, ol, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    @jax.jit
    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            text, tl, mels, spk, emo, ol, train=True,
            rngs={"dropout": jax.random.PRNGKey(3),
                  "noise": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        mel_l, gate_l, attn_l = tacotron2_loss(out, (mels, gate), tl, ol)
        return mel_l + gate_l + attn_l

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # Some gradient must reach the embedding and the location conv.
    assert float(jnp.abs(g["embedding"]).sum()) > 0
    assert float(jnp.abs(g["decoder"]["loc_conv_w"]).sum()) > 0


def test_conv_discriminator():
    hp = tiny_hp()
    disc = Discriminator(hp)
    B, T = 2, 60  # 3 windows of 20
    mel = jnp.asarray(np.random.RandomState(0).randn(B, T, 80), jnp.float32)
    variables = disc.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, mel)
    scores = disc.apply(variables, mel, rngs={"dropout": jax.random.PRNGKey(2)})
    assert scores.shape == (B, 3)

    lengths = jnp.asarray([55, 30])
    loss = disc.apply(variables, mel.transpose(0, 2, 1), lengths,
                      method=disc.adversarial_loss,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))


def test_linear_discriminator():
    hp = tiny_hp(discriminator_type="linear")
    disc = LinearDiscriminator(hp)
    W = hp.discriminator_window * hp.n_mel_channels
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, W), jnp.float32)
    variables = disc.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, x)
    out = disc.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == (2, 4, 1)

    mel = jnp.asarray(np.random.RandomState(1).randn(2, 80, 60), jnp.float32)
    lengths = jnp.asarray([60, 35])
    loss = disc.apply(variables, mel, lengths,
                      method=disc.adversarial_loss,
                      rngs={"dropout": jax.random.PRNGKey(2),
                            "windows": jax.random.PRNGKey(3)})
    assert np.isfinite(float(loss))


def test_inference_early_exit_matches_scan():
    hp = tiny_hp()
    batch = make_batch(hp)
    model, variables, _ = init_and_apply(hp, batch)
    text = batch[0][:1]
    rngs = {"dropout": jax.random.PRNGKey(5), "noise": jax.random.PRNGKey(6)}
    out_scan = model.apply(variables, text, method=model.infer, rngs=rngs)
    out_wl = model.apply(variables, text, None, None, None, None, True,
                         method=model.infer, rngs=rngs)
    # Same rngs -> identical decode up to each stop point.
    L = int(out_scan[4][0])
    assert int(out_wl[4][0]) == L
    np.testing.assert_allclose(np.asarray(out_scan[0])[0, :, :L],
                               np.asarray(out_wl[0])[0, :, :L], atol=1e-4)


def test_n_frames_per_step_2():
    """K frames per decoder step (reference declares n_frames_per_step,
    hparams.py:71, but only supports 1): frame-level output shapes, masking
    and losses must be unchanged; the alignment has T_out/K rows."""
    from gantron_tpu.losses import tacotron2_loss

    hp = tiny_hp(n_frames_per_step=2)
    batch = make_batch(hp)  # T_out=24, divisible by 2
    model, variables, out = init_and_apply(hp, batch)
    mel, mel_post, gates, align = out
    B, T_in, T_out = 2, 11, 24
    assert mel.shape == (B, hp.n_mel_channels, T_out)
    assert mel_post.shape == (B, hp.n_mel_channels, T_out)
    assert gates.shape == (B, T_out)
    assert align.shape == (B, T_out // 2, T_in)
    # Gate energies repeat within each 2-frame group (one energy per step).
    np.testing.assert_array_equal(np.asarray(gates)[:, 0::2][:, :-1],
                                  np.asarray(gates)[:, 1::2][:, :-1])
    # parse_output masking still frame-level.
    ol = np.asarray(batch[5])
    assert np.all(np.asarray(mel)[1, :, ol[1]:] == 0)

    text, tl, mels, spk, emo, ol_, gate = batch
    losses = tacotron2_loss(out, (mels, gate), tl, ol_)
    assert all(np.isfinite(float(l)) for l in losses)


def test_n_frames_per_step_2_inference():
    hp = tiny_hp(n_frames_per_step=2, max_decoder_steps=12)
    batch = make_batch(hp)
    model, variables, _ = init_and_apply(hp, batch)
    text = batch[0][:1]
    rngs = {"dropout": jax.random.PRNGKey(5), "noise": jax.random.PRNGKey(6)}
    out = model.apply(variables, text, method=model.infer, rngs=rngs)
    mel, mel_post, gates, align, lengths = out
    assert mel.shape == (1, hp.n_mel_channels, 24)  # 12 steps * K=2 frames
    assert gates.shape == (1, 24)
    assert align.shape == (1, 12, text.shape[1])
    assert int(lengths[0]) % 2 == 0  # frame lengths are step multiples

    out_ee = model.apply(variables, text, method=model.infer,
                         rngs=rngs, early_exit=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out_ee[0]),
                               atol=2e-5)
