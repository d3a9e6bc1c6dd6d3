"""Deferred-dW decoder backward: exactness vs plain autodiff.

The deferred path (config.deferred_dw) detaches the five big in-scan decoder
weights, captures per-step gate cotangents through zero-valued offsets, and
rebuilds dW as post-scan batched matmuls (train/step.py::apply_deferred_dw).
This must be *exact* — same loss, same gradients, same optimizer update —
because sum_t x_t^T dgates_t is literally what the in-scan accumulator
computes, just reassociated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.train.state import create_train_state
from gantron_tpu.train.step import make_train_steps

from test_train_step import tiny_hp, synth_batch


def _one_g_step(hp, batch, seed=0):
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(seed), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    new_state, metrics, (gen_mel, _) = jax.jit(g_step)(
        state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    return new_state, metrics, gen_mel


@pytest.mark.parametrize("n_frames", [1, 2])
def test_deferred_matches_plain(n_frames):
    hp_d = tiny_hp(deferred_dw=True, n_frames_per_step=n_frames)
    hp_p = tiny_hp(deferred_dw=False, n_frames_per_step=n_frames)
    batch = synth_batch(hp_d)

    s_d, m_d, mel_d = _one_g_step(hp_d, batch)
    s_p, m_p, mel_p = _one_g_step(hp_p, batch)

    # Identical rng streams -> identical forward values.
    np.testing.assert_allclose(np.asarray(mel_d), np.asarray(mel_p),
                               rtol=0, atol=1e-6)
    for k in ("generator_loss", "mel_loss", "gate_loss", "attention_loss"):
        assert abs(float(m_d[k]) - float(m_p[k])) < 1e-6, k
    assert np.isfinite(float(m_d["grad_norm"]))
    # Gradients must agree, hence the Adam-updated params must agree. Adam
    # normalizes each coordinate by its second moment, so even tiny grads
    # must match to tight relative precision for this to pass.
    flat_d = jax.tree.leaves(s_d.g_params)
    flat_p = jax.tree.leaves(s_p.g_params)
    for a, b in zip(flat_d, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_deferred_grad_norm_matches():
    """grad_norm (computed from the patched tree) must equal the plain one."""
    hp_d = tiny_hp(deferred_dw=True)
    hp_p = tiny_hp(deferred_dw=False)
    batch = synth_batch(hp_d, seed=3)
    _, m_d, _ = _one_g_step(hp_d, batch, seed=1)
    _, m_p, _ = _one_g_step(hp_p, batch, seed=1)
    a, b = float(m_d["grad_norm"]), float(m_p["grad_norm"])
    assert abs(a - b) / max(abs(b), 1e-9) < 1e-4, (a, b)


def test_deferred_with_vesus_conditioning(tmp_path):
    """Deferred path under the widest memory (speaker+emotion+noise concat)."""
    hp_d = tiny_hp(deferred_dw=True, use_labels=True, vesus_path=str(tmp_path),
                   encoder_inputs=False)
    hp_p = tiny_hp(deferred_dw=False, use_labels=True,
                   vesus_path=str(tmp_path), encoder_inputs=False)
    batch = synth_batch(hp_d, seed=5)
    s_d, m_d, _ = _one_g_step(hp_d, batch, seed=2)
    s_p, m_p, _ = _one_g_step(hp_p, batch, seed=2)
    assert abs(float(m_d["generator_loss"]) - float(m_p["generator_loss"])) \
        < 1e-6
    for a, b in zip(jax.tree.leaves(s_d.g_params),
                    jax.tree.leaves(s_p.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
