"""Diversity-sensitive rollout regularizer (hp.diversity_weight).

The InfoGAN Q head alone has a cold-start saddle: a style-invariant
generator (which teacher-forced MSE encourages — the style is pure noise
w.r.t. the forced target) makes the Q head flat, and a flat Q passes zero
gradient back to the generator, so identification never starts (measured:
docs/TRAINING_EVIDENCE.md round 4 — recon loss pinned at the uniform
prior's 1/12 floor for 3000 iterations). The DSGAN-style term (Yang et al.,
ICLR 2019) decodes the rollout twice with two style draws under a SHARED
dropout key and rewards output distance per unit style distance; its
gradient is nonzero exactly at the style-invariant point. These tests pin
that mechanism: the term computes, its gradient reaches the generator, and
the config guards fail fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.train.state import create_train_state
from gantron_tpu.train.step import make_train_steps

from test_train_step import synth_batch, tiny_hp


@pytest.fixture(scope="module")
def setup():
    """ONE shared model/state/compiled-G-step for the whole module: the
    two-rollout forward+backward scan is the expensive compile here. Config
    matches the study's infogan_ds variant (Q head + diversity)."""
    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
                 diversity_weight=1.0)
    batch = synth_batch(hp, B=4, T_in=10, T_out=24)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    return hp, batch, state, gen, disc, g_tx, d_tx, jax.jit(g_step)


def test_diversity_metric_and_update(setup):
    hp, batch, state, gen, disc, g_tx, d_tx, g_step = setup
    new_state, metrics, (fake_mel, fake_lengths) = g_step(
        state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    ratio = float(metrics["style_diversity_ratio"])
    # At init the two style-conditioned decodes already differ a little
    # (random weights are style-sensitive), and the ratio is clamped at tau.
    assert np.isfinite(ratio) and 0 < ratio <= hp.diversity_tau
    assert np.isfinite(float(metrics["generator_loss"]))
    assert np.isfinite(float(metrics["style_reconstruction_loss"]))
    # The fake pair feeding D is still the FIRST rollout (mel shape pinned).
    assert fake_mel.shape == batch.mels.shape
    before = jax.tree.leaves(state.g_params["decoder"])
    after = jax.tree.leaves(new_state.g_params["decoder"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))


def test_diversity_changes_g_gradient(setup):
    """The DS term must reach the GENERATOR weights. Comparing weight=1.0
    against a vanishing weight=1e-9 (NOT weight=0, which would skip the
    second rollout entirely and change the step for unrelated reasons)
    isolates exactly the diversity gradient."""
    hp, batch, state, gen, disc, g_tx, d_tx, g_on = setup
    hp_eps = tiny_hp(adversarial_rollouts=True,
                     style_reconstruction_weight=5.0,
                     diversity_weight=1e-9)
    g_eps, _, _ = make_train_steps(hp_eps, gen, disc, g_tx, d_tx)

    s_on, _, _ = g_on(state, batch, jnp.float32(1e-3), jnp.float32(0.0))
    s_eps, _, _ = jax.jit(g_eps)(state, batch, jnp.float32(1e-3),
                                 jnp.float32(0.0))
    d_on = np.asarray(s_on.g_params["decoder"]["proj_w"])
    d_eps = np.asarray(s_eps.g_params["decoder"]["proj_w"])
    assert np.abs(d_on - d_eps).max() > 0


def test_diversity_cap_saturates(setup):
    """Output-unit form (hp.diversity_cap > 0): the reward is
    mean(min(d_out, cap))/cap in [0, 1], and its gradient is identically
    zero once the two decodes differ by the cap. The ratio form measurably
    fails this (it keeps paying until d_out = tau*d_z, far past a mode flip
    for large code redraws — the round-4 'watermarking' collapse, 2 chip
    seeds). Pinned via the step itself: a vanishing cap saturates
    immediately (ratio == 1, zero diversity gradient, so the update matches
    the vanishing-WEIGHT arm), while a huge cap leaves the gradient live."""
    hp, batch, state, gen, disc, g_tx, d_tx, _ = setup

    def run(**kw):
        hp_v = tiny_hp(adversarial_rollouts=True,
                       style_reconstruction_weight=5.0, **kw)
        g, _, _ = make_train_steps(hp_v, gen, disc, g_tx, d_tx)
        s, m, _ = jax.jit(g)(state, batch, jnp.float32(1e-3),
                             jnp.float32(0.0))
        return np.asarray(s.g_params["decoder"]["proj_w"]), m

    p_sat, m_sat = run(diversity_weight=1.0, diversity_cap=1e-6)
    p_eps, _ = run(diversity_weight=1e-12, diversity_cap=1e-6)
    p_live, m_live = run(diversity_weight=1.0, diversity_cap=100.0)
    # Saturated: reward pinned at 1, no gradient -> identical update to the
    # vanishing-weight arm (same second-rollout graph, so this isolates
    # exactly the diversity gradient).
    assert float(m_sat["style_diversity_ratio"]) == 1.0
    np.testing.assert_allclose(p_sat, p_eps, atol=1e-7)
    # Below the cap: reward in (0, 1), gradient live.
    assert 0 < float(m_live["style_diversity_ratio"]) < 1.0
    assert np.abs(p_live - p_sat).max() > 0


def test_style_code_dims_q_head_width():
    """With a code/nuisance split the Q head reconstructs ONLY the code:
    predict_style must return (B, style_code_dims), and the guard must
    reject a code wider than the latent."""
    from gantron_tpu.models import Tacotron2, make_discriminator

    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
                 diversity_weight=0.5, style_code_dims=2)
    batch = synth_batch(hp, B=2, T_in=8, T_out=16)
    gen = Tacotron2(hp)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        batch.text, batch.text_lengths, batch.mels, batch.speaker,
        batch.emotions, batch.output_lengths, method=gen.init_full)
    pred = gen.apply({"params": variables["params"]},
                     batch.mels, batch.output_lengths,
                     method=gen.predict_style)
    assert pred.shape == (2, 2)

    hp_bad = tiny_hp(adversarial_rollouts=True,
                     style_reconstruction_weight=5.0,
                     style_code_dims=10_000)
    with pytest.raises(ValueError, match="style_code_dims"):
        make_train_steps(hp_bad, Tacotron2(hp_bad),
                         make_discriminator(hp_bad), None, None)


def test_requires_rollouts_and_noise():
    from gantron_tpu.models import Tacotron2, make_discriminator

    hp = tiny_hp(diversity_weight=1.0)
    with pytest.raises(ValueError, match="adversarial_rollouts"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)
    hp = tiny_hp(diversity_weight=1.0, adversarial_rollouts=True,
                 use_noise=False)
    with pytest.raises(ValueError, match="noise"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)


class _GridHP:
    noise_size = 8
    style_code_dims = 0
    style_code_levels = 0
    validation_sample_diversity = 8


def test_code_separation_ratio_synthetic():
    """The rescue sensor on constructed grids: codes that move the output
    score > 1; an ignored code (nuisance-driven output, shared per draw)
    scores < 1. Raw spread cannot make this distinction — the calibration
    on real composed-study checkpoints measured collapsed arms' spread
    INSIDE the healthy band (scripts/calibrate_rescue_floor.py)."""
    from gantron_tpu.eval.sampling import code_separation_ratio

    L, S, n_mel, T = 2, 4, 6, 10
    rng = np.random.RandomState(0)
    lengths = np.full(L * S, T)

    # Healthy: output = big per-level offset + small per-draw jitter.
    healthy = np.zeros((L * S, n_mel, T), np.float32)
    for l in range(L):
        for s in range(S):
            healthy[l * S + s] = 5.0 * l + 0.1 * rng.randn(n_mel, T)
    assert code_separation_ratio(healthy, lengths, L, S) > 3.0

    # Collapsed latent: output depends ONLY on the nuisance draw (shared
    # across levels within a draw) — same-draw cross-level pairs are near
    # identical, within-level pairs differ by the draw.
    collapsed = np.zeros((L * S, n_mel, T), np.float32)
    per_draw = [5.0 * rng.randn(n_mel, T) for _ in range(S)]
    for l in range(L):
        for s in range(S):
            collapsed[l * S + s] = per_draw[s] + 0.1 * rng.randn(n_mel, T)
    assert code_separation_ratio(collapsed, lengths, L, S) < 0.5


def test_separation_grid_styles_structure():
    """Grid construction invariants: level-major layout; discrete-code
    grids share nuisance dims across levels within a draw and sweep the
    training grid (k+0.5)/L on the code dims; continuous grids repeat one
    style per level."""
    from gantron_tpu.eval.sampling import (probe_grid_shape,
                                           separation_grid_styles)

    hp = _GridHP()
    L, S = probe_grid_shape(hp)
    assert (L, S) == (2, 4)
    style = np.asarray(separation_grid_styles(hp, L, S,
                                              jax.random.PRNGKey(0)))
    assert style.shape == (L * S, 1, hp.noise_size)
    # Continuous: all draws of a level identical, levels differ.
    for l in range(L):
        block = style[l * S:(l + 1) * S]
        assert np.all(block == block[0])
    assert not np.allclose(style[0], style[S])

    hp2 = _GridHP()
    hp2.style_code_dims, hp2.style_code_levels = 2, 2
    L2, S2 = probe_grid_shape(hp2)
    style2 = np.asarray(separation_grid_styles(hp2, L2, S2,
                                               jax.random.PRNGKey(0)))
    # Code dims sweep the training grid per level.
    assert np.allclose(style2[:S2, 0, :2], 0.25)
    assert np.allclose(style2[S2:, 0, :2], 0.75)
    # Nuisance dims shared across levels within a draw.
    assert np.allclose(style2[:S2, 0, 2:], style2[S2:, 0, 2:])
    # ... and distinct across draws.
    assert not np.allclose(style2[0, 0, 2:], style2[1, 0, 2:])


def test_separation_grid_styles_per_dim():
    """The factor-aware form (dim=d): only dim d sweeps the levels; the
    other code dims sit on trained grid values, shared across levels
    within a draw; nuisance construction matches the diagonal form (the
    committed ceiling calibration depends on those exact draws)."""
    from gantron_tpu.eval.sampling import (probe_grid_shape,
                                           separation_grid_styles)

    hp = _GridHP()
    hp.style_code_dims, hp.style_code_levels = 2, 2
    L, S = probe_grid_shape(hp)
    key = jax.random.PRNGKey(0)
    diag = np.asarray(separation_grid_styles(hp, L, S, key))
    for d in range(2):
        g = np.asarray(separation_grid_styles(hp, L, S, key, dim=d))
        assert g.shape == diag.shape
        # Probed dim sweeps the training grid per level.
        assert np.allclose(g[:S, 0, d], 0.25)
        assert np.allclose(g[S:, 0, d], 0.75)
        other = 1 - d
        # Other code dim: on the trained grid, shared across levels.
        assert set(np.unique(g[:, 0, other]).tolist()) <= {0.25, 0.75}
        assert np.allclose(g[:S, 0, other], g[S:, 0, other])
        # Nuisance dims identical to the diagonal grid's draws.
        assert np.allclose(g[:, 0, 2:], diag[:, 0, 2:])
    # The two dims' "other" draws differ (independent fold) on some keys.
    g0 = np.asarray(separation_grid_styles(hp, L, S, key, dim=0))
    g1 = np.asarray(separation_grid_styles(hp, L, S, key, dim=1))
    assert g0.shape == g1.shape

    import pytest

    with pytest.raises(ValueError):
        separation_grid_styles(hp, L, S, key, dim=2)


# ---------------- code-modularity term (hp.code_modularity_weight) ------


def test_shift_code_masked():
    """shift_code_masked: EXACTLY the masked dims move to a different
    grid level; unmasked dims are untouched; values stay on the grid."""
    from gantron_tpu.train.step import shift_code_masked

    code = jnp.full((32, 1, 3), 0.25)
    mask = jnp.zeros((32, 1, 3), bool).at[:, :, 1].set(True)
    out = np.asarray(shift_code_masked(jax.random.PRNGKey(0), code, 2,
                                       mask))
    assert np.all(out[:, :, [0, 2]] == 0.25)
    assert np.all(out[:, :, 1] == 0.75)  # 2-level: the flip
    assert set(np.unique(out).tolist()) <= {0.25, 0.75}

    # 4-level: masked dim always lands on a DIFFERENT grid value.
    code4 = jnp.full((64, 1, 2), 0.125)  # level 0 of 4
    m4 = jnp.zeros((64, 1, 2), bool).at[:, :, 0].set(True)
    out4 = np.asarray(shift_code_masked(jax.random.PRNGKey(1), code4, 4,
                                        m4))
    assert np.all(out4[:, :, 1] == 0.125)
    assert np.all(out4[:, :, 0] != 0.125)
    assert set(np.unique(out4).tolist()) <= {0.125, 0.375, 0.625, 0.875}

    # Continuous codes: masked dim redrawn U[0,1).
    outc = np.asarray(shift_code_masked(jax.random.PRNGKey(2), code, 0,
                                        mask))
    assert np.all(outc[:, :, [0, 2]] == 0.25)
    assert np.all((0 <= outc[:, :, 1]) & (outc[:, :, 1] < 1))


def test_delta_orthogonality_law():
    """delta_orthogonality: deltas on disjoint mel bands score ~0, deltas
    driving the same band score ~1, a dead dim contributes ~0, and frames
    past every decode's stop are ignored."""
    from gantron_tpu.train.step import delta_orthogonality

    B, C, T = 2, 8, 10
    base = jnp.zeros((B, C, T))
    full = jnp.full((B,), T)
    band_lo = jnp.zeros((B, C, T)).at[:, :4, :].set(1.0)
    band_hi = jnp.zeros((B, C, T)).at[:, 4:, :].set(1.0)
    # Disjoint bands -> orthogonal.
    assert float(delta_orthogonality(base, band_lo, band_hi, full, full,
                                     full)) < 1e-5
    # Same band (even with opposite sign) -> |cos| = 1.
    assert float(delta_orthogonality(base, band_lo, -0.5 * band_lo, full,
                                     full, full)) > 1 - 1e-5
    # Dead dim j -> ~0 penalty (den floor), never NaN.
    dead = float(delta_orthogonality(base, band_lo, base, full, full,
                                     full))
    assert np.isfinite(dead) and dead < 1e-3
    # Masking: overlap confined to frames past every stop is invisible.
    tail_i = jnp.zeros((B, C, T)).at[:, :4, 8:].set(1.0)
    mixed_j = band_hi.at[:, :4, 8:].set(1.0)  # overlaps tail_i at t>=8
    short = jnp.full((B,), 8)
    masked = float(delta_orthogonality(base, tail_i + band_lo, mixed_j,
                                       short, short, short))
    unmasked = float(delta_orthogonality(base, tail_i + band_lo, mixed_j,
                                         full, full, full))
    assert masked < 1e-5 < unmasked


@pytest.fixture(scope="module")
def mod_setup():
    """Shared compiled G step for the modularity triple (3 rollouts)."""
    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
                 diversity_weight=1.0, diversity_cap=0.9,
                 style_code_dims=2, style_code_levels=2,
                 code_modularity_weight=1.0)
    batch = synth_batch(hp, B=4, T_in=10, T_out=24)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    return hp, batch, state, gen, disc, g_tx, d_tx, jax.jit(g_step)


def test_modularity_metric_and_update(mod_setup):
    hp, batch, state, gen, disc, g_tx, d_tx, g_step = mod_setup
    new_state, metrics, (fake_mel, fake_lengths) = g_step(
        state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    pen = float(metrics["code_modularity_penalty"])
    assert np.isfinite(pen) and 0 <= pen <= 1
    ratio = float(metrics["style_diversity_ratio"])
    assert np.isfinite(ratio) and 0 < ratio <= 1
    assert np.isfinite(float(metrics["generator_loss"]))
    assert fake_mel.shape == batch.mels.shape
    before = jax.tree.leaves(state.g_params["decoder"])
    after = jax.tree.leaves(new_state.g_params["decoder"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))


def test_modularity_changes_g_gradient(mod_setup):
    """The orthogonality penalty must reach the generator: weight 1.0 vs
    a vanishing weight (same 3-rollout graph) isolates its gradient."""
    hp, batch, state, gen, disc, g_tx, d_tx, g_on = mod_setup
    hp_eps = tiny_hp(adversarial_rollouts=True,
                     style_reconstruction_weight=5.0,
                     diversity_weight=1.0, diversity_cap=0.9,
                     style_code_dims=2, style_code_levels=2,
                     code_modularity_weight=1e-9)
    g_eps, _, _ = make_train_steps(hp_eps, gen, disc, g_tx, d_tx)
    s_on, _, _ = g_on(state, batch, jnp.float32(1e-3), jnp.float32(0.0))
    s_eps, _, _ = jax.jit(g_eps)(state, batch, jnp.float32(1e-3),
                                 jnp.float32(0.0))
    d_on = np.asarray(s_on.g_params["decoder"]["proj_w"])
    d_eps = np.asarray(s_eps.g_params["decoder"]["proj_w"])
    assert np.abs(d_on - d_eps).max() > 0


def test_modularity_guards():
    from gantron_tpu.models import Tacotron2, make_discriminator

    # Needs the saturating diversity stage.
    hp = tiny_hp(adversarial_rollouts=True, code_modularity_weight=1.0,
                 style_code_dims=2, style_code_levels=2)
    with pytest.raises(ValueError, match="diversity"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)
    # Needs a multi-dim code.
    hp = tiny_hp(adversarial_rollouts=True, diversity_weight=1.0,
                 diversity_cap=0.9, code_modularity_weight=1.0,
                 style_code_dims=1, style_code_levels=2)
    with pytest.raises(ValueError, match="style_code_dims"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)


def test_delta_additivity_law():
    """delta_additivity: composing per-dim effects additively at the joint
    flip scores 0; same-band toggling (the entangled signature: the joint
    flip undoes what each single flip did) and noise-like deltas score
    high; frames past every stop are ignored."""
    from gantron_tpu.train.step import delta_additivity

    B, C, T = 2, 8, 10
    base = jnp.zeros((B, C, T))
    full = jnp.full((B,), T)
    band_lo = jnp.zeros((B, C, T)).at[:, :4, :].set(1.0)
    band_hi = jnp.zeros((B, C, T)).at[:, 4:, :].set(1.0)
    # Perfectly modular: joint = sum of singles.
    add = float(delta_additivity(base, band_lo, band_hi,
                                 band_lo + band_hi, full, full, full,
                                 full))
    assert add < 1e-6
    # Entangled toggle: each single flip sets the SAME band, the joint
    # flip toggles it back off -> |0 - 1 - 1 + 0| = 2 on that band.
    tog = float(delta_additivity(base, band_lo, band_lo, base, full, full,
                                 full, full))
    assert tog > 0.5
    # Noise deltas never compose: three independent patterns.
    k = jax.random.PRNGKey(0)
    n1, n2, n3 = (jax.random.normal(jax.random.fold_in(k, i), (B, C, T))
                  for i in range(3))
    noise = float(delta_additivity(base, n1, n2, n3, full, full, full,
                                   full))
    assert noise > 0.5
    # Masking: violation confined past every stop is invisible.
    tail = jnp.zeros((B, C, T)).at[:, :, 8:].set(3.0)
    short = jnp.full((B,), 8)
    assert float(delta_additivity(base, band_lo, band_hi,
                                  band_lo + band_hi + tail, short, short,
                                  short, short)) < 1e-6


def test_additivity_step_runs_and_guards():
    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
                 diversity_weight=1.0, diversity_cap=0.9,
                 style_code_dims=2, style_code_levels=2,
                 code_additivity_weight=1.0)
    batch = synth_batch(hp, B=4, T_in=10, T_out=24)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    _, metrics, _ = jax.jit(g_step)(state, batch, jnp.float32(1e-3),
                                    jnp.float32(10.0))
    pen = float(metrics["code_additivity_penalty"])
    assert np.isfinite(pen) and pen >= 0
    # The triple's cosine penalty is NOT computed unless its weight is on.
    assert "code_modularity_penalty" not in metrics
    ratio = float(metrics["style_diversity_ratio"])
    assert np.isfinite(ratio) and 0 < ratio <= 1

    from gantron_tpu.models import Tacotron2, make_discriminator

    hp_bad = tiny_hp(adversarial_rollouts=True, code_additivity_weight=1.0,
                     style_code_dims=2, style_code_levels=2)
    with pytest.raises(ValueError, match="code_additivity_weight"):
        make_train_steps(hp_bad, Tacotron2(hp_bad),
                         make_discriminator(hp_bad), None, None)


def test_delta_cos_signed_per_sample():
    """delta_cos (the code_orthogonal_reward sensor): per-sample SIGNED
    cosine — disjoint bands ~0, same band aligned ~+1, same band opposed
    ~-1 (sin is sign-invariant, so both entangled cases earn nothing),
    dead sibling ~0 (sin ~1: never suppresses the live dim)."""
    from gantron_tpu.train.step import delta_cos

    B, C, T = 2, 8, 10
    base = jnp.zeros((B, C, T))
    full = jnp.full((B,), T)
    band_lo = jnp.zeros((B, C, T)).at[:, :4, :].set(1.0)
    band_hi = jnp.zeros((B, C, T)).at[:, 4:, :].set(1.0)
    ortho = np.asarray(delta_cos(base, band_lo, band_hi, full, full, full))
    assert ortho.shape == (B,) and np.abs(ortho).max() < 1e-5
    aligned = np.asarray(delta_cos(base, band_lo, 0.5 * band_lo, full,
                                   full, full))
    assert aligned.min() > 1 - 1e-5
    opposed = np.asarray(delta_cos(base, band_lo, -0.5 * band_lo, full,
                                   full, full))
    assert opposed.max() < -1 + 1e-5
    dead = np.asarray(delta_cos(base, band_lo, base, full, full, full))
    assert np.isfinite(dead).all() and np.abs(dead).max() < 1e-3


def test_orthogonal_reward_step_and_guards():
    """code_orthogonal_reward (reward-shaped binding): the G step runs the
    modularity-triple decodes with the single-dim contrasts scaled by the
    inter-delta sine; the sin metric is logged in (0, 1]; neither PENALTY
    metric appears (reward-only arm); the guard demands the saturating
    diversity stage."""
    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
                 diversity_weight=1.0, diversity_cap=0.9,
                 style_code_dims=2, style_code_levels=2,
                 code_orthogonal_reward=True)
    batch = synth_batch(hp, B=4, T_in=10, T_out=24)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    new_state, metrics, (fake_mel, _) = jax.jit(g_step)(
        state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    s = float(metrics["code_orthogonal_sin"])
    assert np.isfinite(s) and 0 < s <= 1
    assert "code_modularity_penalty" not in metrics
    assert "code_additivity_penalty" not in metrics
    ratio = float(metrics["style_diversity_ratio"])
    # Scaling by sin <= 1 keeps the saturating reward in (0, 1]; at init
    # the tiny contrasts stay strictly positive (flip guarantee).
    assert np.isfinite(ratio) and 0 < ratio <= 1
    assert np.isfinite(float(metrics["generator_loss"]))
    assert fake_mel.shape == batch.mels.shape
    before = jax.tree.leaves(state.g_params["decoder"])
    after = jax.tree.leaves(new_state.g_params["decoder"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))

    from gantron_tpu.models import Tacotron2, make_discriminator

    hp_bad = tiny_hp(adversarial_rollouts=True, code_orthogonal_reward=True,
                     style_code_dims=2, style_code_levels=2)
    with pytest.raises(ValueError, match="code_orthogonal_reward"):
        make_train_steps(hp_bad, Tacotron2(hp_bad),
                         make_discriminator(hp_bad), None, None)
    hp_bad = tiny_hp(adversarial_rollouts=True, code_orthogonal_reward=True,
                     diversity_weight=1.0, diversity_cap=0.9,
                     style_code_dims=1, style_code_levels=2)
    with pytest.raises(ValueError, match="style_code_dims"):
        make_train_steps(hp_bad, Tacotron2(hp_bad),
                         make_discriminator(hp_bad), None, None)
