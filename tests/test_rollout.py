"""Free-running adversarial rollout training (``hp.adversarial_rollouts``).

The reference GAN only scores teacher-forced generator outputs
(train.py:371-383); rollouts add the discriminator's score on an OPEN-LOOP
decode of the same batch to the G loss and feed rollout fakes to D. These
tests pin: the step runs and logs the new metric; the rollout mel (not the
teacher-forced one) reaches the fake ring-buffer slot with gate-decided
lengths; padded text positions stay masked in the rollout's attention; the
rollout loss contributes gradients; and deferred-dW remains exact with
rollouts enabled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.train.state import create_train_state
from gantron_tpu.train.step import make_train_steps

from test_train_step import synth_batch, tiny_hp


def _one_step(hp, batch, seed=0):
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(seed), tuple(batch))
    g_step, d_step, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    out = jax.jit(g_step)(state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    return out + (jax.jit(d_step),)


def test_rollout_step_runs_and_feeds_rollout_fakes():
    hp = tiny_hp(adversarial_rollouts=True)
    batch = synth_batch(hp)
    state2, metrics, (fake_mel, fake_lengths), d_step = _one_step(hp, batch)

    assert np.isfinite(float(metrics["rollout_adversarial_loss"]))
    assert np.isfinite(float(metrics["generator_loss"]))
    # The fake slot carries the rollout: same padded shape as the batch mels,
    # but lengths are the gate's decision (init = cap = T_out here), NOT a
    # copy of the batch's output_lengths.
    assert fake_mel.shape == batch.mels.shape
    assert fake_lengths.shape == batch.output_lengths.shape
    assert int(fake_lengths.max()) <= batch.mels.shape[2]
    # An untrained gate never fires -> every rollout runs to the cap, while
    # synth_batch's output_lengths are mostly < T_out: the pair really is the
    # rollout, not the teacher-forced passthrough.
    assert not np.array_equal(np.asarray(fake_lengths),
                              np.asarray(batch.output_lengths))
    # And a D step consumes the pair as-is.
    state3, d_metrics = d_step(state2, batch.mels, batch.output_lengths,
                               fake_mel, fake_lengths, jnp.float32(7e-4))
    assert np.isfinite(float(d_metrics["discriminator_loss"]))


def test_rollout_off_keeps_teacher_forced_fakes():
    hp = tiny_hp()
    batch = synth_batch(hp)
    _, metrics, (fake_mel, fake_lengths), _ = _one_step(hp, batch)
    assert "rollout_adversarial_loss" not in metrics
    np.testing.assert_array_equal(np.asarray(fake_lengths),
                                  np.asarray(batch.output_lengths))


def test_rollout_changes_generator_update():
    """The rollout term must actually reach the weights: one step with
    rollouts on vs off (same seed) produces different updated params."""
    batch = synth_batch(tiny_hp())
    s_on, m_on, _, _ = _one_step(tiny_hp(adversarial_rollouts=True), batch)
    s_off, m_off, _, _ = _one_step(tiny_hp(), batch)
    a = np.asarray(jax.tree.leaves(s_on.g_params)[0])
    b = np.asarray(jax.tree.leaves(s_off.g_params)[0])
    assert not np.allclose(a, b)


def test_rollout_attention_masks_padded_text():
    """Open-loop decode of a PADDED batch must put zero attention mass on
    pad positions when text_lengths is passed (infer's serving path has no
    mask; the rollout path must)."""
    from gantron_tpu.models import Tacotron2

    hp = tiny_hp()
    batch = synth_batch(hp)
    model = Tacotron2(hp)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    variables = jax.jit(
        lambda r, *a: model.init(*((r,) + a), train=False))(
        rngs, batch.text, batch.text_lengths, batch.mels, batch.speaker,
        batch.emotions, batch.output_lengths)

    out = model.apply(variables, batch.text, None, batch.emotions,
                      batch.speaker, 8, method=model.infer,
                      text_lengths=batch.text_lengths,
                      rngs={"dropout": jax.random.PRNGKey(3),
                            "noise": jax.random.PRNGKey(4)})
    align = np.asarray(out[3])  # (B, S, T_in)
    lengths = np.asarray(batch.text_lengths)
    for b in range(align.shape[0]):
        np.testing.assert_allclose(align[b, :, lengths[b]:], 0.0, atol=0)
        np.testing.assert_allclose(align[b].sum(-1), 1.0, rtol=1e-5)


def test_rollout_deferred_dw_still_exact():
    """Rollout gradients arrive via plain autodiff while the teacher-forced
    scan uses the deferred-dW reassociation; the two must compose to the
    same total gradient as plain autodiff of everything."""
    batch = synth_batch(tiny_hp())
    s_d, m_d, _, _ = _one_step(
        tiny_hp(adversarial_rollouts=True, deferred_dw=True), batch, seed=1)
    s_p, m_p, _, _ = _one_step(
        tiny_hp(adversarial_rollouts=True, deferred_dw=False), batch, seed=1)
    assert abs(float(m_d["generator_loss"]) - float(m_p["generator_loss"])) \
        < 1e-6
    for a, b in zip(jax.tree.leaves(s_d.g_params),
                    jax.tree.leaves(s_p.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_rollout_rejects_quantized_training():
    hp = tiny_hp(adversarial_rollouts=True, quantized_inference=True)
    batch = synth_batch(hp)
    with pytest.raises(NotImplementedError, match="quantized_inference"):
        _one_step(hp, batch)
