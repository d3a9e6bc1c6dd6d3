"""InfoGAN-style latent identification (hp.style_reconstruction_weight).

The reference injects a uniform latent (model.py:184-191, 273-279) that its
teacher-forced training never asks to carry information (train.py:371-383);
the measured consequence is a functionally dead noise input
(docs/TRAINING_EVIDENCE.md). These tests pin the mechanism that fixes it:
a StyleEncoder head reconstructs the injected style from the free-running
rollout mel inside the G step, its loss joins the G objective, its params
live in g_params (checkpointed like everything else), and the gradient
reaches BOTH the head and the generator.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantron_tpu.train.state import create_train_state
from gantron_tpu.train.step import make_train_steps

from test_train_step import synth_batch, tiny_hp


import pytest as _pytest


@_pytest.fixture(scope="module")
def setup():
    """ONE shared model/state/compiled-G-step for the whole module: the
    rollout G step's forward+backward scan is the expensive compile here."""
    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0)
    batch = synth_batch(hp, B=4, T_in=10, T_out=24)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    return hp, batch, state, gen, disc, g_tx, d_tx, jax.jit(g_step)


def test_style_encoder_params_created_and_trained(setup):
    hp, batch, state, gen, disc, g_tx, d_tx, g_step = setup
    assert "style_encoder" in state.g_params

    new_state, metrics, (fake_mel, fake_lengths) = g_step(
        state, batch, jnp.float32(1e-3), jnp.float32(10.0))
    recon = float(metrics["style_reconstruction_loss"])
    assert np.isfinite(recon) and recon > 0
    assert np.isfinite(float(metrics["generator_loss"]))
    # The identification gradient must move the Q head...
    before = jax.tree.leaves(state.g_params["style_encoder"])
    after = jax.tree.leaves(new_state.g_params["style_encoder"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))
    # ...and the fake pair feeding D is still the rollout (gate lengths).
    assert fake_mel.shape == batch.mels.shape


def test_recon_loss_changes_g_gradient(setup):
    """The reconstruction term must reach the GENERATOR weights through the
    rollout scan, not just the Q head. Comparing weight=5 against a
    vanishing weight=1e-9 (NOT weight=0, which would switch the rollout to
    the in-model noise rng draw and change the decode for an unrelated
    reason) isolates exactly the identification gradient."""
    hp, batch, state, gen, disc, g_tx, d_tx, g_on = setup
    hp_eps = tiny_hp(adversarial_rollouts=True,
                     style_reconstruction_weight=1e-9)
    g_eps, _, _ = make_train_steps(hp_eps, gen, disc, g_tx, d_tx)

    s_on, _, _ = g_on(state, batch, jnp.float32(1e-3), jnp.float32(0.0))
    s_eps, _, _ = jax.jit(g_eps)(state, batch, jnp.float32(1e-3),
                                 jnp.float32(0.0))
    d_on = np.asarray(s_on.g_params["decoder"]["proj_w"])
    d_eps = np.asarray(s_eps.g_params["decoder"]["proj_w"])
    assert np.abs(d_on - d_eps).max() > 0


def test_checkpoint_roundtrip_with_style_encoder(tmp_path, setup):
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.utils.loading import load_generator

    hp, batch, state, gen, disc, g_tx, d_tx, _ = setup
    mgr = CheckpointManager(str(tmp_path))
    path = mgr.save(state, 1, 1.0)
    model, variables = load_generator(path, hp)
    pred = model.apply({"params": variables["params"]},
                       batch.mels, batch.output_lengths,
                       method=model.predict_style)
    assert pred.shape == (4, hp.noise_size)
    assert ((np.asarray(pred) > 0) & (np.asarray(pred) < 1)).all()
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["style_encoder"]["out"]["kernel"]),
        np.asarray(state.g_params["style_encoder"]["out"]["kernel"]))


def test_predict_style_masks_padding(setup):
    """The pooled statistic must ignore frames past each sample's length:
    changing pad-region content must not change the prediction."""
    hp, batch, state, gen, disc, g_tx, d_tx, _ = setup
    mels = np.asarray(batch.mels).copy()
    lengths = np.full((mels.shape[0],), 16, np.int32)
    mels2 = mels.copy()
    # Garbage beyond the VALID positions' receptive field (two stride-2
    # kernel-5 convs: downsampled position j reads frames [4j-6, 4j+6];
    # valid j <= 3 reaches frame 18): frames >= 22 touch only masked
    # positions, so only the pool mask keeps them out of the prediction.
    mels2[:, :, 22:] = 99.0
    variables = {"params": state.g_params}
    p1 = gen.apply(variables, jnp.asarray(mels), jnp.asarray(lengths),
                   method=gen.predict_style)
    p2 = gen.apply(variables, jnp.asarray(mels2), jnp.asarray(lengths),
                   method=gen.predict_style)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-6, atol=1e-6)


def test_identification_warmup_scale(setup):
    """ident_scale=0 must reduce the G update to the pure rollout-GAN
    update (zero gradient to the Q head, identification terms absent from
    the objective) while ident_scale=1 matches the default — the warm-up
    (config.py identification_warmup) is a traced scalar on the SAME
    compiled step, so the loop can flip it mid-run without recompiling."""
    hp, batch, state, gen, disc, g_tx, d_tx, g_step = setup

    lr = 1e-3
    s_off, m_off, _ = g_step(state, batch, jnp.float32(lr),
                             jnp.float32(0.0), jnp.float32(0.0))

    def decay_only_step(p):
        # With the recon gradient scaled out, the Q head's only update
        # source is weight decay, which the optimizer chain adds BEFORE
        # Adam (state.py make_optimizer — torch Adam(weight_decay=)
        # parity). Adam's first step on g = wd*p is analytic: m_hat = g,
        # v_hat = g^2, update = g/(|g| + eps). Asserting EQUALITY with
        # this closed form proves the identification gradient is exactly
        # zero (any recon leakage would perturb it).
        p = np.asarray(p)
        g = hp.weight_decay * p
        return p - lr * g / (np.abs(g) + 1e-8)

    for a, b in zip(jax.tree.leaves(s_off.g_params["style_encoder"]),
                    jax.tree.leaves(state.g_params["style_encoder"])):
        np.testing.assert_allclose(np.asarray(a), decay_only_step(b),
                                   rtol=0, atol=1e-7)
    # The raw recon metric stays visible during warm-up (observability:
    # you can watch the Q floor before the switch).
    assert float(m_off["style_reconstruction_loss"]) > 0
    # Scale 1 (explicit) == default-arg path: the recon gradient is live
    # and the update must deviate from the decay-only closed form.
    s_on, _, _ = g_step(state, batch, jnp.float32(lr),
                        jnp.float32(0.0), jnp.float32(1.0))
    assert any(
        np.abs(np.asarray(a) - decay_only_step(b)).max() > 1e-6
        for a, b in zip(jax.tree.leaves(s_on.g_params["style_encoder"]),
                        jax.tree.leaves(state.g_params["style_encoder"])))


def test_discrete_code_step_runs():
    """style_code_levels=2 (categorical-code InfoGAN, config.py): the G
    step must run with the code prefix drawn from {0.25, 0.75} and the
    diversity redraw flipped to the OTHER level. Semantics pinned at the
    variant level: finite losses, diversity ratio in (0, 1] (the flipped
    pair always differs, so contrast is never zero across a batch)."""
    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
                 diversity_weight=1.0, diversity_cap=0.9,
                 style_code_dims=1, style_code_levels=2)
    batch = synth_batch(hp, B=4, T_in=10, T_out=24)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    _, metrics, _ = jax.jit(g_step)(state, batch, jnp.float32(1e-3),
                                    jnp.float32(0.0))
    recon = float(metrics["style_reconstruction_loss"])
    ratio = float(metrics["style_diversity_ratio"])
    assert np.isfinite(recon) and recon > 0
    # At init the two decodes differ only through the 1-dim code input, so
    # the contrast is small but must be strictly positive (flip guarantee)
    # and within the saturating form's [0, 1] range.
    assert 0 < ratio <= 1.0
    assert np.isfinite(float(metrics["generator_loss"]))


def test_redraw_code_subset_semantics():
    """redraw_code (train/step.py): the all-dims form flips EVERY dim of a
    2-level multi-dim code (so single-dim contrast is never produced);
    the subset form (diversity_subset_redraw) flips a random nonempty
    subset — both single-dim flips occur, pairs never coincide, and all
    values stay on the trained grid. Single-dim codes behave identically
    under both forms."""
    from gantron_tpu.train.step import redraw_code

    code = jnp.full((64, 1, 2), 0.25)  # every sample at cell (0, 0)
    grid = {0.25, 0.75}

    all_flip = redraw_code(jax.random.PRNGKey(0), code, 2, subset=False)
    assert set(np.unique(all_flip).tolist()) <= grid
    # The offset is always 1 mod 2: both dims always flip.
    assert np.all(np.asarray(all_flip) == 0.75)

    sub = np.asarray(
        redraw_code(jax.random.PRNGKey(0), code, 2, subset=True))
    assert set(np.unique(sub).tolist()) <= grid
    flipped = sub != 0.25  # (64, 1, 2) bool
    n_flipped = flipped.sum(axis=-1).ravel()
    assert (n_flipped >= 1).all()  # nonempty subset guarantee
    per_dim_only = [(flipped[:, 0, d] & (n_flipped == 1)).sum()
                    for d in range(2)]
    assert per_dim_only[0] > 0 and per_dim_only[1] > 0  # single-dim flips
    assert (n_flipped == 2).any()  # the joint flip still occurs

    one_dim = jnp.full((32, 1, 1), 0.25)
    a = redraw_code(jax.random.PRNGKey(1), one_dim, 2, subset=False)
    b = redraw_code(jax.random.PRNGKey(1), one_dim, 2, subset=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_redraw_code_dim_weights():
    """Weighted subset redraw (factor_rescue_floor's actuator): with
    weights concentrated on one dim, nearly every pair is a single-dim
    flip of THAT dim (the guaranteed dim follows the weights and other
    dims join with probability 0.5 * w_d / max(w)); pairs still never
    coincide; uniform weights keep both dims active like the unweighted
    form."""
    from gantron_tpu.train.step import redraw_code

    code = jnp.full((256, 1, 2), 0.25)
    heavy = np.asarray(redraw_code(
        jax.random.PRNGKey(2), code, 2, subset=True,
        dim_weights=jnp.asarray([1000.0, 1.0])))
    flipped = heavy != 0.25
    n_flipped = flipped.sum(axis=-1).ravel()
    assert (n_flipped >= 1).all()  # nonempty guarantee survives weighting
    # Dim 0 carries ~all the contrast: it flips on virtually every pair,
    # dim 1 only at its ~0.05% residual rates.
    assert flipped[:, 0, 0].mean() > 0.98
    assert flipped[:, 0, 1].mean() < 0.05

    uniform = np.asarray(redraw_code(
        jax.random.PRNGKey(2), code, 2, subset=True,
        dim_weights=jnp.asarray([1.0, 1.0])))
    uflip = uniform != 0.25
    un = uflip.sum(axis=-1).ravel()
    assert (un >= 1).all()
    # Same LAW as the unweighted form: both dims flip alone sometimes,
    # the joint flip still occurs.
    for d in range(2):
        assert (uflip[:, 0, d] & (un == 1)).sum() > 0
    assert (un == 2).any()

    # UNIFORM weights must be BIT-IDENTICAL to the unweighted branch
    # (not just same-law): the collapse basin is draw-sensitive, so an
    # unarmed factor-rescue controller has to be trajectory-identical to
    # the baseline (measured: a same-law/different-draws uniform arm
    # collapsed 2/3 seeds the baseline identified). The weighted form is
    # scale-invariant, so EVERY uniform vector [c, c] — not just ones —
    # is the unweighted law and must take the unweighted draws (a
    # lockstep-escalated controller, e.g. both dims below floor, stays
    # on the baseline trajectory too). Exercise eager and jit (weights
    # traced) — the selection predicate is traced.
    unweighted = np.asarray(redraw_code(
        jax.random.PRNGKey(2), code, 2, subset=True))
    np.testing.assert_array_equal(uniform, unweighted)
    jit_redraw = jax.jit(
        lambda k, c, w: redraw_code(k, c, 2, subset=True, dim_weights=w))
    for c in (1.0, 4.0, 8.0):
        np.testing.assert_array_equal(
            np.asarray(jit_redraw(jax.random.PRNGKey(2), code,
                                  jnp.full(2, c))), unweighted)
    # Non-uniform weights still take the weighted draw under the same key.
    assert not np.array_equal(heavy, unweighted)


def test_factor_rescue_unarmed_trajectory_identity():
    """An UNARMED factor-rescue controller (all per-dim weights 1.0) must
    leave the G step bit-identical to a run with no controller at all.
    Measured to matter (docs/TRAINING_EVIDENCE.md factor-rescue warmup):
    the collapse basin is draw-sensitive, and an earlier same-law/
    different-draws unarmed path collapsed a factorial seed the baseline
    identified. Pinned at the step level: one g_step with
    dim_weights=ones equals one with dim_weights=None on every updated
    generator param; a genuinely escalated weight vector diverges."""
    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
                 diversity_weight=1.0, diversity_cap=0.9,
                 diversity_subset_redraw=True,
                 style_code_dims=2, style_code_levels=2,
                 # Explicit: the config default flipped to "recon" after
                 # the redraw actuator measured harmful; this block pins
                 # the REDRAW actuator's contract.
                 factor_rescue_actuator="redraw")
    batch = synth_batch(hp, B=4, T_in=10, T_out=24)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    g_step, _, _ = make_train_steps(hp, gen, disc, g_tx, d_tx)
    step = jax.jit(g_step)
    args = (state, batch, jnp.float32(1e-3), jnp.float32(0.0),
            jnp.float32(1.0))
    base, _, _ = step(*args)
    unarmed, _, _ = step(*args, jnp.ones(2, jnp.float32))
    # A lockstep-escalated controller (both dims below floor -> both at
    # the same gain) is uniform too, hence still the baseline trajectory.
    lockstep, _, _ = step(*args, jnp.full(2, 4.0, jnp.float32))
    armed, _, _ = step(*args, jnp.asarray([8.0, 1.0], jnp.float32))
    base_leaves = jax.tree_util.tree_leaves(base.g_params)
    unarmed_leaves = jax.tree_util.tree_leaves(unarmed.g_params)
    lockstep_leaves = jax.tree_util.tree_leaves(lockstep.g_params)
    armed_leaves = jax.tree_util.tree_leaves(armed.g_params)
    for b, u, s in zip(base_leaves, unarmed_leaves, lockstep_leaves):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(u))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(s))
    assert any(not np.array_equal(np.asarray(b), np.asarray(a))
               for b, a in zip(base_leaves, armed_leaves))

    # The RECON actuator (factor_rescue_actuator='recon') has the same
    # contract: uniform weights bit-identical to no controller, asymmetric
    # weights act — but through the per-dim Q-head errors, so its armed
    # update differs from the redraw actuator's too.
    hp_q = tiny_hp(adversarial_rollouts=True,
                   style_reconstruction_weight=5.0,
                   diversity_weight=1.0, diversity_cap=0.9,
                   diversity_subset_redraw=True,
                   style_code_dims=2, style_code_levels=2,
                   factor_rescue_actuator="recon")
    gq_step, _, _ = make_train_steps(hp_q, gen, disc, g_tx, d_tx)
    stepq = jax.jit(gq_step)
    q_unarmed, _, _ = stepq(*args, jnp.full(2, 4.0, jnp.float32))
    q_armed, _, _ = stepq(*args, jnp.asarray([8.0, 1.0], jnp.float32))
    q_unarmed_leaves = jax.tree_util.tree_leaves(q_unarmed.g_params)
    q_armed_leaves = jax.tree_util.tree_leaves(q_armed.g_params)
    for b, u in zip(base_leaves, q_unarmed_leaves):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(u))
    assert any(not np.array_equal(np.asarray(b), np.asarray(a))
               for b, a in zip(base_leaves, q_armed_leaves))
    assert any(not np.array_equal(np.asarray(r), np.asarray(q))
               for r, q in zip(armed_leaves, q_armed_leaves))


def test_factor_rescue_actuator_guards():
    """factor_rescue_actuator: unknown values fail fast; 'recon' with an
    armed controller demands the Q head it weights."""
    from test_train_step import tiny_hp as _hp
    from gantron_tpu.models import Tacotron2, make_discriminator

    hp = _hp(adversarial_rollouts=True, style_reconstruction_weight=5.0,
             diversity_weight=1.0, diversity_cap=0.9,
             style_code_dims=2, style_code_levels=2,
             factor_rescue_actuator="sideways")
    with pytest.raises(ValueError, match="factor_rescue_actuator"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)
    hp = _hp(adversarial_rollouts=True, diversity_weight=1.0,
             diversity_cap=0.9, diversity_subset_redraw=True,
             style_code_dims=2, style_code_levels=2,
             factor_rescue_floor=2.18, factor_rescue_actuator="recon")
    with pytest.raises(ValueError, match="style_reconstruction_weight"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)


def test_coded_style_semantics():
    """Serving-side counterpart of the training code grid: coded_style
    pins the code prefix to (k + 0.5) / L — the exact values the trained
    grid uses (step.py _draw_code) — and draws nuisance dims U[0, 1)."""
    from gantron_tpu.eval.sampling import coded_style

    key = jax.random.PRNGKey(3)
    s = coded_style(key, 5, 8, code=0, code_dims=2, code_levels=2)
    assert s.shape == (5, 1, 8)
    assert np.allclose(np.asarray(s[:, 0, :2]), 0.25)
    s1 = coded_style(key, 5, 8, code=1, code_dims=2, code_levels=2)
    assert np.allclose(np.asarray(s1[:, 0, :2]), 0.75)
    # Same key => identical nuisance dims: the pair differs ONLY in code.
    assert np.array_equal(np.asarray(s[:, 0, 2:]), np.asarray(s1[:, 0, 2:]))
    nuis = np.asarray(s[:, 0, 2:])
    assert (nuis >= 0).all() and (nuis < 1).all() and nuis.std() > 0
    # Per-sample levels (a code sweep in one batch), 4-level grid.
    sweep = coded_style(key, 4, 8, code=np.arange(4), code_dims=1,
                        code_levels=4)
    assert np.allclose(np.asarray(sweep[:, 0, 0]),
                       [0.125, 0.375, 0.625, 0.875])
    # Per-DIM levels: the training draw is independent per code dim, so a
    # 2-dim binary code has 4 trained cells; the (code_dims,) and
    # (n_samples, code_dims) forms reach the off-diagonal ones.
    offd = coded_style(key, 3, 8, code=np.array([0, 1]), code_dims=2)
    assert np.allclose(np.asarray(offd[:, 0, :2]), [0.25, 0.75])
    full = coded_style(key, 2, 8, code=np.array([[0, 1], [1, 0]]),
                       code_dims=2)
    assert np.allclose(np.asarray(full[:, 0, :2]),
                       [[0.25, 0.75], [0.75, 0.25]])
    with pytest.raises(ValueError, match="code_dims"):
        coded_style(key, 2, 8, code=0, code_dims=9)
    with pytest.raises(ValueError, match="code_levels"):
        coded_style(key, 2, 8, code=0, code_levels=1)
    with pytest.raises(ValueError, match="code shape"):
        coded_style(key, 3, 8, code=np.arange(2))


def test_coded_style_drives_infer(setup):
    """A pinned code must flow through Tacotron2.infer as the style input:
    same key + same code is deterministic, and flipping ONLY the code
    changes the decode (the serving API for the identified-mode control
    measured in docs/TRAINING_EVIDENCE.md round 4)."""
    from gantron_tpu.eval.sampling import coded_style

    hp, batch, state, gen, disc, g_tx, d_tx, g_step = setup
    variables = {"params": state.g_params, "batch_stats": state.g_batch_stats}
    text = jnp.asarray(batch.text[:2])
    rngs = {"dropout": jax.random.PRNGKey(5), "noise": jax.random.PRNGKey(6)}
    key = jax.random.PRNGKey(11)
    lo = coded_style(key, 2, hp.noise_size, code=0)
    hi = coded_style(key, 2, hp.noise_size, code=1)
    out_lo = gen.apply(variables, text, lo, method=gen.infer, rngs=rngs)
    out_lo2 = gen.apply(variables, text, lo, method=gen.infer, rngs=rngs)
    out_hi = gen.apply(variables, text, hi, method=gen.infer, rngs=rngs)
    assert np.array_equal(np.asarray(out_lo[1]), np.asarray(out_lo2[1]))
    assert not np.array_equal(np.asarray(out_lo[1]), np.asarray(out_hi[1]))


def test_attribution_level_grid_shape_and_axes(setup):
    """The shared attribution decode grid (one key-schedule definition for
    mode_attribution.py AND gan_composed_study.py): deterministic for a
    seed, style-axis rows differ (the latent axis is live), and the level
    scalar responds to the requested channel band."""
    from gantron_tpu.eval.sampling import attribution_level_grid

    hp, batch, state, gen, disc, g_tx, d_tx, g_step = setup
    variables = {"params": state.g_params, "batch_stats": state.g_batch_stats}
    seq = np.asarray(batch.text[:1])
    channels = np.arange(hp.n_mel_channels // 2)

    grid = attribution_level_grid(gen, variables, hp, seq, channels,
                                  n_styles=3, n_dropout=2, seed=0,
                                  max_decoder_steps=12)
    grid2 = attribution_level_grid(gen, variables, hp, seq, channels,
                                   n_styles=3, n_dropout=2, seed=0,
                                   max_decoder_steps=12)
    assert grid.shape == (3, 2)
    assert np.array_equal(grid, grid2)
    assert np.isfinite(grid).all()
    # Different styles decode differently through an untrained net too.
    assert not np.allclose(grid[0], grid[1])
    # A different band reads a different level off the same decodes.
    other_channels = np.arange(hp.n_mel_channels // 2, hp.n_mel_channels)
    other = attribution_level_grid(
        gen, variables, hp, seq, other_channels,
        n_styles=3, n_dropout=2, seed=0, max_decoder_steps=12)
    assert not np.allclose(grid, other)
    # Multi-band form (the factorial study): one decode grid, per-band
    # scores identical to the single-band calls.
    multi = attribution_level_grid(
        gen, variables, hp, seq, [channels, other_channels],
        n_styles=3, n_dropout=2, seed=0, max_decoder_steps=12)
    assert multi.shape == (3, 2, 2)
    assert np.array_equal(multi[:, :, 0], grid)
    assert np.array_equal(multi[:, :, 1], other)


def test_single_level_code_rejected():
    from gantron_tpu.models import Tacotron2, make_discriminator

    hp = tiny_hp(adversarial_rollouts=True, style_reconstruction_weight=1.0,
                 style_code_dims=1, style_code_levels=1)
    with pytest.raises(ValueError, match="style_code_levels"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)


def test_requires_rollouts_and_noise():
    # make_train_steps validates the config before any compile, so no state
    # is needed (and none should be built — the guard exists to fail fast).
    from gantron_tpu.models import Tacotron2, make_discriminator

    hp = tiny_hp(style_reconstruction_weight=1.0)
    with pytest.raises(ValueError, match="adversarial_rollouts"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)
    hp = tiny_hp(style_reconstruction_weight=1.0,
                 adversarial_rollouts=True, use_noise=False)
    with pytest.raises(ValueError, match="noise"):
        make_train_steps(hp, Tacotron2(hp), make_discriminator(hp),
                         None, None)
