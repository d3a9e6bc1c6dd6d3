"""Jitted G/D/eval train steps (reference: train.py:291-440 inner loop).

Each step is a single pjit-able function: forward + losses + grads + Adam
update fused into one XLA program. The G/D alternation *schedule* stays in
host Python (gantron_tpu.train.loop); the compute never leaves the device.

Parity notes:
  * ``real``/``fake`` Wasserstein signs default to +1/-1 (reference
    train.py:509-510, --real flag).
  * the reference calls clip_grad_norm_ on the discriminator BEFORE
    backward() (train.py:326-332), making its WGAN clipping a no-op; here the
    evident intent — clipping the D gradient at ``clipping_value`` — is
    implemented (documented deviation).
  * learning rates are passed in as scalars so the host-side halving schedule
    (train.py:433-435) never triggers recompilation.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gantron_tpu.losses import gradient_penalty, tacotron2_loss


class Batch(NamedTuple):
    """One padded, bucketed batch (device layout mirrors reference
    TextMelCollate output, data_utils.py:88-131)."""

    text: jax.Array            # (B, T_in) int32
    text_lengths: jax.Array    # (B,) int32
    mels: jax.Array            # (B, n_mel, T_out) float32
    gate: jax.Array            # (B, T_out) float32
    speaker: jax.Array         # (B,) int32
    emotions: jax.Array        # (B, 5) float32
    output_lengths: jax.Array  # (B,) int32


def _adv_loss(discriminator, d_params, mel_bct, lengths, rng, train=True):
    rngs = {"dropout": rng}
    if type(discriminator).__name__ == "LinearDiscriminator":
        rngs["windows"] = jax.random.fold_in(rng, 7)
    return discriminator.apply({"params": d_params}, mel_bct, lengths,
                               train, method=discriminator.adversarial_loss,
                               rngs=rngs)


def pad_mel_to_window(mel_bct, window):
    """Zero-pad (B, n_mel, T) so T is a multiple of the discriminator
    window."""
    T = mel_bct.shape[2]
    pad = (-T) % window
    if pad:
        mel_bct = jnp.pad(mel_bct, ((0, 0), (0, 0), (0, pad)))
    return mel_bct


def make_dw_offsets(hp, batch_size, t_out, dtype):
    """Zero-valued per-step gate offsets for the decoder's deferred-dW
    backward (see models.tacotron2.ScanWeights)."""
    steps = t_out // getattr(hp, "n_frames_per_step", 1)
    z = lambda d: jnp.zeros((steps, batch_size, d), dtype)
    return dict(z1=z(4 * hp.attention_rnn_dim), z2=z(4 * hp.decoder_rnn_dim),
                zq=z(hp.attention_dim))


def apply_deferred_dw(hp, grads, dw_aux, d_off):
    """Fill in the gradients of the decoder's detached in-scan weights.

    For each in-scan matmul ``gates_t = x_t @ W (+ ...)`` autodiff delivered
    the per-step gate cotangents as ``d_off`` (the zero offsets' gradients);
    dW is then exactly ``sum_t x_t^T dgates_t`` — one big (steps*B)-row MXU
    matmul per weight instead of a read-modify-write of the full gradient
    accumulator on every backward scan step. ``x_t`` values at step entry are
    the previous step's emitted activations (zero at t=0), so everything is
    recovered from the forward scan's outputs by a one-step shift.
    """
    attn_hs = dw_aux["attn_hs"]      # attn_h_t (post-dropout), (S, B, A)
    dec_hs = dw_aux["dec_hs"]        # dec_h_t (post-dropout), (S, B, R)
    contexts = dw_aux["contexts"]    # context_t, (S, B, D)
    dz1, dz2, dzq = d_off["z1"], d_off["z2"], d_off["zq"]
    P = hp.prenet_dim

    def shift(x):  # value at step entry: previous step's output, 0 at t=0
        return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)

    def ein(x, dz):
        return jnp.einsum("sbi,sbo->io", x, dz,
                          preferred_element_type=jnp.float32)

    dec = dict(grads["decoder"])
    arn = dec["attention_rnn"]
    dec["attention_rnn"] = arn._replace(
        # rows [:P] (hoisted prenet projection) came from plain autodiff;
        # rows [P:] are the in-scan context columns.
        w_ih=arn.w_ih.at[P:].add(ein(shift(contexts), dz1)),
        w_hh=arn.w_hh + ein(shift(attn_hs), dz1))
    dec["query_w"] = dec["query_w"] + ein(attn_hs, dzq)
    drn = dec["decoder_rnn"]
    dec["decoder_rnn"] = drn._replace(
        w_ih=drn.w_ih + jnp.concatenate(
            [ein(attn_hs, dz2), ein(contexts, dz2)], axis=0),
        w_hh=drn.w_hh + ein(shift(dec_hs), dz2))
    out = dict(grads)
    out["decoder"] = dec
    return out


def redraw_code(key, code, code_levels, subset=False, dim_weights=None):
    """Diversity-pair code redraw (config.py diversity_weight).

    Discrete (code_levels >= 2): shift by a nonzero offset mod L so the
    pair ALWAYS differs (a same-code pair decodes identically under the
    shared dropout key — zero contrast, wasted sample). Continuous
    (code_levels == 0): independent U[0,1) redraw.

    ``subset=True`` (config.py diversity_subset_redraw) shifts a random
    NONEMPTY subset of the code dims instead of every dim. Why that
    matters for multi-dim codes: with the all-dims form and 2-level codes
    the offset is always 1 mod 2, so every diversity pair is the
    all-dims flip (0,0)<->(1,1) / (0,1)<->(1,0) — the reward never asks a
    SINGLE dim's flip to move the output, which is exactly the per-dim
    control a factorized (disentangled) code needs. Single-dim codes are
    unaffected (the nonempty subset is that dim).

    ``dim_weights`` (subset mode only; config.py factor_rescue_floor): a
    traced ``(dims,)`` positive vector from the factor-aware rescue
    controller. The guaranteed dim is drawn ~ ``dim_weights`` (instead of
    uniformly) and other dims join the subset with probability
    ``0.5 * w_d / max(w)`` (instead of 0.5) — concentrated weights make
    the pairs mostly single-dim flips of the weak dim, which then owes
    the full diversity contrast on its own. UNIFORM weights (all equal —
    the form is scale-invariant, so [c,..,c] is the unweighted law for
    every c) take the EXACT unweighted draws (same keys, same samplers),
    so an unarmed or lockstep-escalated controller is trajectory-
    identical to the baseline — measured to matter: the collapse basin
    is draw-sensitive, and a "same law, different draws" uniform arm
    collapsed 2/3 seeds the baseline identified
    (docs/TRAINING_EVIDENCE.md factor-rescue trajectory identity)."""
    if code_levels == 0:
        return jax.random.uniform(key, code.shape)
    k = jnp.round(code * code_levels - 0.5).astype(jnp.int32)
    dims = code.shape[-1]
    if subset and dims > 1:
        k_off, k_mask, k_force = jax.random.split(key, 3)
        off = jax.random.randint(k_off, code.shape, 1, code_levels)
        if dim_weights is None:
            mask = jax.random.bernoulli(k_mask, 0.5, code.shape)
            force_idx = jax.random.randint(
                k_force, code.shape[:-1], 0, dims)
        else:
            w = jnp.asarray(dim_weights, jnp.float32)
            mask_p = 0.5 * w / jnp.maximum(jnp.max(w), 1e-9)
            mask = jax.random.bernoulli(
                k_mask, jnp.broadcast_to(mask_p, code.shape))
            # UNIFORM weights (all equal, not just all 1.0) must be
            # BIT-IDENTICAL to the unweighted branch: the weighted form is
            # scale-invariant (mask_p normalizes by max(w); categorical's
            # argmax is invariant to a constant logit shift), so [c,...,c]
            # is the unweighted LAW for every c — but categorical and
            # randint draw differently from the same key, and the collapse
            # basin is draw-sensitive (see docstring). Compute both from
            # k_force and select on the traced uniformity predicate.
            force_idx = jnp.where(
                jnp.all(w == w[0]),
                jax.random.randint(k_force, code.shape[:-1], 0, dims),
                jax.random.categorical(
                    k_force, jnp.log(jnp.maximum(w, 1e-9)),
                    shape=code.shape[:-1]))
        # Guarantee a nonempty subset: one drawn dim always shifts, so
        # the pair can never be identical.
        force = jax.nn.one_hot(force_idx, dims, dtype=bool)
        off = jnp.where(mask | force, off, 0)
    else:
        off = jax.random.randint(key, code.shape, 1, code_levels)
    return (((k + off) % code_levels).astype(jnp.float32)
            + 0.5) / code_levels


def shift_code_masked(key, code, code_levels, mask):
    """Shift EXACTLY the masked code dims to a different value (discrete:
    nonzero offset mod L; continuous: independent U[0,1) redraw); other
    dims unchanged. The single-dim building block of the modularity
    triple (config.py code_modularity_weight)."""
    if code_levels == 0:
        return jnp.where(mask, jax.random.uniform(key, code.shape), code)
    k = jnp.round(code * code_levels - 0.5).astype(jnp.int32)
    off = jnp.where(mask, jax.random.randint(key, code.shape, 1,
                                             code_levels), 0)
    return (((k + off) % code_levels).astype(jnp.float32)
            + 0.5) / code_levels


def delta_cos(base_mel, mel_i, mel_j, len_base, len_i, len_j):
    """Per-sample cosine between the two per-dim output deltas of a
    modularity triple. Frames past every decode's gate stop are masked
    out. A dead dim (|delta| ~ 0) gives cos ~ 0 (the 1e-6 denominator
    floor), i.e. sin ~ 1 — a dead sibling never suppresses the live
    dim's orthogonal-component reward (config.py
    code_orthogonal_reward); deadness is the diversity reward's job."""
    tri_len = jnp.maximum(jnp.maximum(len_base, len_i), len_j)
    m3 = (jnp.arange(base_mel.shape[2])[None, :]
          < tri_len[:, None]).astype(jnp.float32)[:, None, :]
    d_vec_i = (mel_i - base_mel) * m3
    d_vec_j = (mel_j - base_mel) * m3
    num = jnp.sum(d_vec_i * d_vec_j, axis=(1, 2))
    den = jnp.sqrt(jnp.sum(d_vec_i * d_vec_i, axis=(1, 2))
                   * jnp.sum(d_vec_j * d_vec_j, axis=(1, 2)))
    return num / jnp.maximum(den, 1e-6)


def delta_orthogonality(base_mel, mel_i, mel_j, len_base, len_i, len_j):
    """Mean |cosine| between the two per-dim output deltas of a modularity
    triple (config.py code_modularity_weight): deltas occupying disjoint
    output structure (e.g. disjoint mel bands) score ~0, deltas driving
    the same channel score ~1. Measured FAILURE as a penalty
    (docs/TRAINING_EVIDENCE.md "Binding penalties"): near-orthogonality
    is free for noise-like deltas, and the penalty is minimized by zero
    code effects — kept for the record/ablations."""
    return jnp.mean(jnp.abs(delta_cos(
        base_mel, mel_i, mel_j, len_base, len_i, len_j)))


def delta_additivity(base_mel, mel_i, mel_j, mel_ij,
                     len_base, len_i, len_j, len_ij):
    """Masked mean-L1 of the mixed second difference
    G(z_ij) - G(z_i) - G(z_j) + G(z) — the discrete off-diagonal Hessian
    (config.py code_additivity_weight). Zero iff the two per-dim effects
    compose additively at the joint flip; noise-like deltas and entangled
    same-band effects both violate it. In mel-L1 units (the
    diversity_cap scale); frames past every decode's gate stop masked."""
    quad_len = jnp.maximum(jnp.maximum(len_base, len_i),
                           jnp.maximum(len_j, len_ij))
    m4 = (jnp.arange(base_mel.shape[2])[None, :]
          < quad_len[:, None]).astype(jnp.float32)[:, None, :]
    resid = (mel_ij - mel_i - mel_j + base_mel) * m4
    return jnp.mean(jnp.sum(jnp.abs(resid), axis=(1, 2))
                    / (base_mel.shape[1] * jnp.maximum(quad_len, 1)))


def make_train_steps(hp, generator, discriminator, g_tx, d_tx,
                     real: float = 1.0):
    """Build the jit-ready generator/discriminator/eval step functions."""
    fake = -real
    if (hp.gradient_penalty_lambda > 0
            and type(discriminator).__name__ == "LinearDiscriminator"):
        # The reference has the same latent crash (train.py:49 feeds raw mel
        # into a window-flattened MLP); fail with a clear message instead of
        # an XLA shape error mid-trace.
        raise NotImplementedError(
            "gradient_penalty_lambda > 0 is not supported with "
            "discriminator_type='linear'; use the conv discriminator or "
            "disable the gradient penalty")
    roll_flag = bool(getattr(hp, "adversarial_rollouts", False))
    rollouts = roll_flag and hp.d_freq > 0
    style_recon_w = float(getattr(hp, "style_reconstruction_weight", 0.0))
    style_recon = style_recon_w > 0
    if style_recon and not roll_flag:
        raise ValueError(
            "style_reconstruction_weight > 0 requires "
            "adversarial_rollouts=True: the InfoGAN head reconstructs the "
            "style from the FREE-RUNNING rollout mel (a teacher-forced mel "
            "carries the mode in its forced history, not the latent — "
            "docs/TRAINING_EVIDENCE.md)")
    if style_recon and generator.noise_size == 0:
        raise ValueError(
            "style_reconstruction_weight > 0 requires use_noise=True with "
            "noise_size > 0 (there is no latent to identify)")
    div_w = float(getattr(hp, "diversity_weight", 0.0))
    div_tau = float(getattr(hp, "diversity_tau", 10.0))
    div_cap = float(getattr(hp, "diversity_cap", 0.0))
    diversity = div_w > 0
    if diversity and not roll_flag:
        raise ValueError(
            "diversity_weight > 0 requires adversarial_rollouts=True: the "
            "regularizer compares two FREE-RUNNING decodes of the same "
            "batch under a shared dropout key (a teacher-forced decode is "
            "pinned to the forced history, so there is nothing to diversify)")
    if diversity and generator.noise_size == 0:
        raise ValueError(
            "diversity_weight > 0 requires use_noise=True with "
            "noise_size > 0 (there is no latent to diversify over)")
    rescue_actuator = str(getattr(hp, "factor_rescue_actuator", "redraw")
                          or "redraw")
    if rescue_actuator not in ("redraw", "recon"):
        raise ValueError(
            f"factor_rescue_actuator={rescue_actuator!r} must be 'redraw' "
            "(bias the subset-redraw/probe draws) or 'recon' (weight the "
            "per-dim style-reconstruction errors) — config.py "
            "factor_rescue_actuator")
    if (rescue_actuator == "recon"
            and float(getattr(hp, "factor_rescue_floor", 0.0) or 0.0) > 0
            and not float(getattr(hp, "style_reconstruction_weight", 0.0))):
        raise ValueError(
            "factor_rescue_actuator='recon' with factor_rescue_floor > 0 "
            "requires style_reconstruction_weight > 0: the recon actuator "
            "weights exactly those per-dim reconstruction errors")
    mod_w = float(getattr(hp, "code_modularity_weight", 0.0))
    add_w = float(getattr(hp, "code_additivity_weight", 0.0))
    modularity = mod_w > 0
    additivity = add_w > 0
    ortho_reward = bool(getattr(hp, "code_orthogonal_reward", False))
    if modularity or additivity or ortho_reward:
        flag = ("code_modularity_weight" if modularity
                else "code_additivity_weight" if additivity
                else "code_orthogonal_reward")
        if not diversity or div_cap <= 0:
            raise ValueError(
                f"{flag} > 0 requires diversity_weight > 0 "
                "and diversity_cap > 0: the per-dim flip decodes extend "
                "the saturating diversity stage (config.py "
                f"{flag})")
        if int(getattr(hp, "style_code_dims", 0)) < 2:
            raise ValueError(
                f"{flag} > 0 requires style_code_dims >= 2: "
                "modular binding is only defined between distinct code "
                "dims")
    code_dims = int(getattr(hp, "style_code_dims", 0))
    if code_dims > generator.noise_size:
        raise ValueError(
            f"style_code_dims={code_dims} exceeds noise_size="
            f"{generator.noise_size}: the code is a PREFIX of the style "
            "vector (config.py style_code_dims)")
    code_dims = code_dims or generator.noise_size
    code_levels = int(getattr(hp, "style_code_levels", 0))
    if code_levels == 1:
        raise ValueError(
            "style_code_levels=1 is a constant code (nothing to identify); "
            "use 0 for continuous or >= 2 for a discrete grid")

    def _draw_code(key, shape):
        """Code-dim draw: continuous U[0,1) or, when style_code_levels >= 2,
        the discrete grid {(k+0.5)/L} — the categorical-code InfoGAN form
        that a discrete generative factor can satisfy ON-manifold (config.py
        style_code_levels; the continuous form measurably watermarks)."""
        if code_levels == 0:
            return jax.random.uniform(key, shape)
        k = jax.random.randint(key, shape, 0, code_levels)
        return (k.astype(jnp.float32) + 0.5) / code_levels

    subset_redraw = bool(getattr(hp, "diversity_subset_redraw", False))
    if (float(getattr(hp, "factor_rescue_floor", 0.0) or 0.0) > 0
            and not subset_redraw):
        raise ValueError(
            "factor_rescue_floor > 0 requires diversity_subset_redraw=True: "
            "the factor-aware rescue's actuator is the weighted subset "
            "redraw (config.py factor_rescue_floor)")

    def _redraw_code(key, code, dim_weights=None):
        return redraw_code(key, code, code_levels, subset=subset_redraw,
                           dim_weights=dim_weights)
    roll_decode = rollouts or style_recon or diversity
    inject_style = style_recon or diversity
    if roll_decode and getattr(hp, "quantized_inference", False):
        # The int8 scan weights round-trip through quantize_per_channel whose
        # round() has zero gradient — rollout training would silently stop
        # learning the recurrence matrices.
        raise NotImplementedError(
            "adversarial_rollouts=True cannot train through "
            "quantized_inference=True (int8 rounding kills the rollout "
            "gradients); quantize for serving only")
    # fp16_run maps to bfloat16 compute on TPU (checked here, not only in
    # __post_init__, so late `--hparams fp16_run=True` overrides work too).
    bf16 = (getattr(hp, "compute_dtype", "float32") == "bfloat16"
            or getattr(hp, "fp16_run", False))

    def _cast_in(tree):
        """Mixed precision (the TPU analogue of the reference's apex AMP O2,
        train.py:245-248): bf16 compute params, f32 master params/optimizer;
        no loss scaling needed — bf16 shares float32's exponent range."""
        if not bf16:
            return tree
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
            tree)

    deferred_dw = bool(getattr(hp, "deferred_dw", False))

    # ---------------- generator ----------------
    def g_step(state, batch: Batch, g_lr, attn_weight, ident_scale=1.0,
               dim_weights=None):
        """One fused generator update. Returns (state, metrics,
        (fake_mel, fake_lengths)) — the fake pair feeds the loop's ring
        buffer for subsequent D steps: the teacher-forced mel with the
        batch's lengths by default, the free-running rollout mel with its
        gate-decided lengths when ``hp.adversarial_rollouts``.

        ``ident_scale`` (traced, 0/1) gates the InfoGAN identification
        terms for hp.identification_warmup (config.py): the loop passes 0
        during warm-up so the run is a pure rollout GAN until D has
        anchored the manifold, then 1 — same compiled graph throughout.

        ``dim_weights`` (traced (code_dims,) or None): the factor-aware
        rescue controller's per-dim weights (config.py
        factor_rescue_floor). Routed by hp.factor_rescue_actuator:
        "redraw" biases the subset-redraw/probe draws (redraw_code
        docstring), "recon" weights the per-dim style-reconstruction
        errors instead. None = uniform."""
        redraw_weights = dim_weights if rescue_actuator == "redraw" else None
        recon_weights = dim_weights if rescue_actuator == "recon" else None
        (rng, k_drop, k_noise, k_disc, k_roll, k_roll_noise,
         k_roll_disc) = jax.random.split(state.rng, 7)

        def loss_fn(g_params, dw_offsets):
            mels_in = (batch.mels.astype(jnp.bfloat16) if bf16
                       else batch.mels)
            result, mutated = generator.apply(
                {"params": _cast_in(g_params),
                 "batch_stats": state.g_batch_stats},
                batch.text, batch.text_lengths, mels_in, batch.speaker,
                batch.emotions, batch.output_lengths, train=True,
                dw_offsets=dw_offsets,
                rngs={"dropout": k_drop, "noise": k_noise},
                mutable=["batch_stats"])
            out, dw_aux = result if dw_offsets is not None else (result, None)
            out = [o.astype(jnp.float32) for o in out]
            new_bs = jax.tree.map(lambda x: x.astype(jnp.float32),
                                  mutated["batch_stats"])
            mel_l, gate_l, attn_l = tacotron2_loss(
                out, (batch.mels, batch.gate), batch.text_lengths,
                batch.output_lengths)
            taco = mel_l + gate_l
            adv = jnp.zeros(())
            if hp.d_freq > 0:
                gen_mel = pad_mel_to_window(out[1], hp.discriminator_window)
                adv = real * _adv_loss(discriminator,
                                       _cast_in(state.d_params),
                                       _cast_in(gen_mel),
                                       batch.output_lengths, k_disc)
                adv = adv.astype(jnp.float32)
            fake_pair = (out[1], batch.output_lengths)
            roll_adv = jnp.zeros(())
            recon_loss = jnp.zeros(())
            div_loss = jnp.zeros(())
            div_ratio = jnp.zeros(())
            mod_pen = jnp.zeros(())
            add_pen = jnp.zeros(())
            if roll_decode:
                # Free-running decode of the SAME batch: fresh noise, no
                # teacher forcing, pad-masked attention. Differentiable end
                # to end (the open-loop scan has no stop_gradient when
                # unquantized), so D's score on what the model actually
                # samples reaches every generator weight.
                K = getattr(hp, "n_frames_per_step", 1)
                style = None
                if inject_style:
                    # The latent must be a live tensor here: the InfoGAN Q
                    # head reconstructs it (and the diversity term contrasts
                    # over it) below. Injecting it explicitly (instead of
                    # the in-model "noise" rng draw) keeps the rollout
                    # distribution identical — same uniform prior, same
                    # shape.
                    k_style = jax.random.fold_in(k_roll_noise, 1)
                    style = jax.random.uniform(
                        k_style,
                        (batch.text.shape[0], 1, generator.noise_size))
                    if code_levels:
                        style = style.at[:, :, :code_dims].set(_draw_code(
                            jax.random.fold_in(k_style, 7),
                            (batch.text.shape[0], 1, code_dims)))
                roll = generator.apply(
                    {"params": _cast_in(g_params),
                     "batch_stats": state.g_batch_stats},
                    batch.text, style, batch.emotions, batch.speaker,
                    batch.mels.shape[2] // K,
                    method=generator.infer,
                    text_lengths=batch.text_lengths,
                    rngs={"dropout": k_roll, "noise": k_roll_noise})
                roll_mel = roll[1].astype(jnp.float32)
                roll_lengths = roll[4]
                if rollouts:
                    roll_p = pad_mel_to_window(roll_mel,
                                               hp.discriminator_window)
                    roll_adv = real * _adv_loss(discriminator,
                                                _cast_in(state.d_params),
                                                _cast_in(roll_p),
                                                roll_lengths, k_roll_disc)
                    roll_adv = roll_adv.astype(jnp.float32)
                    # D then trains against the distribution serving will
                    # sample.
                    fake_pair = (roll_mel, roll_lengths)
                if style_recon:
                    # Variational I(style; mel) bound: MSE against the
                    # injected style. Gradients train Q AND reach the
                    # generator through the rollout scan.
                    pred = generator.apply(
                        {"params": _cast_in(g_params)},
                        roll[1], roll_lengths,
                        method=generator.predict_style)
                    recon_err = (pred.astype(jnp.float32)
                                 - style[:, 0, :code_dims]) ** 2
                    if recon_weights is not None:
                        # Recon actuator (config.py factor_rescue_actuator
                        # ="recon"): concentrate IDENTIFICATION pressure on
                        # the weak dim instead of redistributing the
                        # zero-sum redraw (the redraw actuator starves the
                        # healthy dim's contrast reward — measured harmful,
                        # docs/TRAINING_EVIDENCE.md). Mean-normalized so
                        # total pressure is weight-scale invariant; a
                        # UNIFORM vector takes the exact unweighted mean
                        # (bit-identical unarmed controller, same predicate
                        # as redraw_code).
                        w = jnp.asarray(recon_weights, jnp.float32)
                        recon_loss = jnp.where(
                            jnp.all(w == w[0]),
                            jnp.mean(recon_err),
                            jnp.mean(recon_err
                                     * (w / jnp.mean(w))[None, :]))
                    else:
                        recon_loss = jnp.mean(recon_err)
                if diversity:
                    def _roll_again(style_x):
                        # Re-decode with the dropout key and nuisance dims
                        # SHARED (per-step dropout masks derive
                        # deterministically from the passed rng), so the
                        # decodes differ exactly by the injected code.
                        r2 = generator.apply(
                            {"params": _cast_in(g_params),
                             "batch_stats": state.g_batch_stats},
                            batch.text, style_x, batch.emotions,
                            batch.speaker, batch.mels.shape[2] // K,
                            method=generator.infer,
                            text_lengths=batch.text_lengths,
                            rngs={"dropout": k_roll, "noise": k_roll_noise})
                        return r2[1].astype(jnp.float32), r2[4]

                    def _pair_d_out(mel2, len2):
                        # The rollout scan zeroes mel frames past each
                        # sample's gate stop (tacotron2.py _open_step), so
                        # averaging over the full padded grid would (a)
                        # dilute d_out by the post-stop zeros and (b) pay
                        # full-mel reward over [min_len, max_len) when the
                        # code merely moves the stop step. Average over
                        # each PAIR's max length instead: frames where one
                        # decode has stopped and the other hasn't still
                        # count (that IS an output difference serving
                        # would produce), but the denominator is the
                        # frames either decode actually emits.
                        pair_len = jnp.maximum(roll_lengths, len2)
                        T_roll = roll_mel.shape[2]
                        frame_mask = (jnp.arange(T_roll)[None, :]
                                      < pair_len[:, None]).astype(
                                          jnp.float32)
                        return (jnp.sum(jnp.abs(roll_mel - mel2)
                                        * frame_mask[:, None, :],
                                        axis=(1, 2))
                                / (roll_mel.shape[1]
                                   * jnp.maximum(pair_len, 1)))

                    code = style[:, :, :code_dims]
                    if modularity or additivity or ortho_reward:
                        # Modularity triple (config.py
                        # code_modularity_weight): base + dim-i flip +
                        # dim-j flip. Each single-dim pair owes the full
                        # saturating contrast on its own, and the two
                        # per-dim output deltas are pushed ORTHOGONAL —
                        # the finite-difference surrogate of the Hessian
                        # Penalty's off-diagonal term (Peebles et al.,
                        # ECCV 2020): dims binding disjoint output
                        # structure score 0, dims driving the same
                        # channel score ~1.
                        k_i = jax.random.fold_in(k_roll_noise, 3)
                        B = batch.text.shape[0]
                        if redraw_weights is None:
                            i_idx = jax.random.randint(
                                k_i, (B,), 0, code_dims)
                        else:
                            # Factor-aware rescue composes: the weak dim
                            # is probed (as delta i) more often. UNIFORM
                            # weights select the exact unweighted draw so
                            # an unarmed controller stays trajectory-
                            # identical to the baseline (see redraw_code).
                            w = jnp.asarray(redraw_weights, jnp.float32)
                            i_idx = jnp.where(
                                jnp.all(w == w[0]),
                                jax.random.randint(k_i, (B,), 0, code_dims),
                                jax.random.categorical(
                                    k_i, jnp.log(jnp.maximum(w, 1e-9)),
                                    shape=(B,)))
                        j_idx = (i_idx + jax.random.randint(
                            jax.random.fold_in(k_roll_noise, 4), (B,), 1,
                            code_dims)) % code_dims
                        oh = lambda idx: jax.nn.one_hot(
                            idx, code_dims, dtype=bool)[:, None, :]
                        nuis = style[:, :, code_dims:]
                        code_i = shift_code_masked(
                            jax.random.fold_in(k_roll_noise, 5), code,
                            code_levels, oh(i_idx))
                        code_j = shift_code_masked(
                            jax.random.fold_in(k_roll_noise, 6), code,
                            code_levels, oh(j_idx))
                        mel_i, len_i = _roll_again(
                            jnp.concatenate([code_i, nuis], axis=-1))
                        mel_j, len_j = _roll_again(
                            jnp.concatenate([code_j, nuis], axis=-1))
                        d_i = _pair_d_out(mel_i, len_i)
                        d_j = _pair_d_out(mel_j, len_j)
                        if ortho_reward:
                            # Reward-shaped binding (config.py
                            # code_orthogonal_reward): scale each
                            # single-dim contrast by the SINE between the
                            # two per-dim output deltas. Entangled
                            # (parallel) effects earn ~0, a dead dim earns
                            # ~0 through d_i itself, orthogonal live
                            # effects earn full — there is no term a zero
                            # code effect can satisfy (the measured
                            # failure mode of both binding PENALTIES,
                            # docs/TRAINING_EVIDENCE.md).
                            cos = delta_cos(roll_mel, mel_i, mel_j,
                                            roll_lengths, len_i, len_j)
                            ortho_sin = jnp.sqrt(
                                jnp.clip(1.0 - cos * cos, 1e-6, 1.0))
                            rewards = [
                                jnp.mean(jnp.minimum(d_i * ortho_sin,
                                                     div_cap)),
                                jnp.mean(jnp.minimum(d_j * ortho_sin,
                                                     div_cap))]
                        else:
                            rewards = [jnp.mean(jnp.minimum(d_i, div_cap)),
                                       jnp.mean(jnp.minimum(d_j, div_cap))]
                        if modularity:
                            mod_pen = delta_orthogonality(
                                roll_mel, mel_i, mel_j, roll_lengths,
                                len_i, len_j)
                        if additivity:
                            # Fourth decode: the JOINT flip, with the same
                            # per-dim offsets as the single flips (the
                            # offset draw depends only on the key+mask, so
                            # re-applying both shifts composes them).
                            code_ij = shift_code_masked(
                                jax.random.fold_in(k_roll_noise, 5),
                                code_j, code_levels, oh(i_idx))
                            mel_ij, len_ij = _roll_again(
                                jnp.concatenate([code_ij, nuis], axis=-1))
                            # The joint pair owes contrast too (the
                            # all-dims flip the subset redraw sampled).
                            rewards.append(jnp.mean(jnp.minimum(
                                _pair_d_out(mel_ij, len_ij), div_cap)))
                            add_pen = delta_additivity(
                                roll_mel, mel_i, mel_j, mel_ij,
                                roll_lengths, len_i, len_j, len_ij)
                        div_ratio = sum(rewards) / (len(rewards) * div_cap)
                    else:
                        # Second rollout: redraw ONLY the code dims.
                        # Per-sample output-distance per unit
                        # code-distance, clamped at tau, rewarded.
                        redraw = _redraw_code(
                            jax.random.fold_in(k_roll_noise, 2), code,
                            redraw_weights)
                        mel2, len2 = _roll_again(jnp.concatenate(
                            [redraw, style[:, :, code_dims:]], axis=-1))
                        d_out = _pair_d_out(mel2, len2)
                        if div_cap > 0:
                            # Output-unit saturation (config.py
                            # diversity_cap): reward in [0, 1], zero
                            # gradient past the cap — the ratio form below
                            # measurably "watermarks" (off-manifold spread
                            # pays until d_out = tau*d_z, far beyond a
                            # mode flip for large code redraws).
                            div_ratio = jnp.mean(
                                jnp.minimum(d_out, div_cap)) / div_cap
                        else:
                            d_z = jnp.mean(
                                jnp.abs(code - redraw), axis=(1, 2))
                            div_ratio = jnp.mean(jnp.minimum(
                                d_out / jnp.maximum(d_z, 1e-6), div_tau))
                    div_loss = -div_ratio
            total = (taco + adv + roll_adv
                     + ident_scale * (style_recon_w * recon_loss
                                      + div_w * div_loss
                                      + mod_w * mod_pen
                                      + add_w * add_pen)
                     + attn_weight * attn_l)
            aux = dict(mel_loss=mel_l, gate_loss=gate_l, attention_loss=attn_l,
                       adversarial_loss=adv, taco_loss=taco,
                       generator_loss=total,
                       batch_stats=new_bs,
                       generated_mel=fake_pair,
                       dw_aux=dw_aux)
            if rollouts:
                aux["rollout_adversarial_loss"] = roll_adv
            if style_recon:
                aux["style_reconstruction_loss"] = recon_loss
            if diversity:
                aux["style_diversity_ratio"] = div_ratio
            if modularity:
                aux["code_modularity_penalty"] = mod_pen
            if additivity:
                aux["code_additivity_penalty"] = add_pen
            if ortho_reward:
                aux["code_orthogonal_sin"] = jnp.mean(ortho_sin)
            return total, aux

        if deferred_dw:
            offsets = make_dw_offsets(
                hp, batch.mels.shape[0], batch.mels.shape[2],
                jnp.bfloat16 if bf16 else jnp.float32)
            total, vjp_fn, aux = jax.vjp(loss_fn, state.g_params, offsets,
                                         has_aux=True)
            grads, d_off = vjp_fn(jnp.ones_like(total))
            grads = apply_deferred_dw(hp, grads, aux.pop("dw_aux"), d_off)
        else:
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.g_params, None)
            aux.pop("dw_aux")
        grad_norm = optax.global_norm(grads)
        updates, g_opt_state = g_tx.update(grads, state.g_opt_state,
                                           state.g_params)
        updates = jax.tree.map(lambda u: -g_lr * u, updates)
        g_params = optax.apply_updates(state.g_params, updates)

        new_state = state.replace(
            step=state.step + 1, g_params=g_params,
            g_batch_stats=aux.pop("batch_stats"), g_opt_state=g_opt_state,
            rng=rng)
        fake_pair = aux.pop("generated_mel")
        aux["grad_norm"] = grad_norm
        return new_state, aux, fake_pair

    # ---------------- discriminator ----------------
    def d_step(state, real_mel, real_lengths, gen_mel, gen_lengths, d_lr):
        rng, k_real, k_fake, k_gp = jax.random.split(state.rng, 4)
        W = hp.discriminator_window
        real_p = pad_mel_to_window(real_mel, W)
        gen_p = pad_mel_to_window(gen_mel, W)

        def loss_fn(d_params):
            dp = _cast_in(d_params)
            real_loss = real * _adv_loss(discriminator, dp, _cast_in(real_p),
                                         real_lengths, k_real)
            # Generated mel enters detached (it is a value, not a trace of G).
            fake_loss = fake * _adv_loss(discriminator, dp, _cast_in(gen_p),
                                         gen_lengths, k_fake)
            real_loss = real_loss.astype(jnp.float32)
            fake_loss = fake_loss.astype(jnp.float32)
            loss = (real_loss + fake_loss) / 2
            gp = jnp.zeros(())
            if hp.gradient_penalty_lambda > 0:
                def disc_scores(params, x, rng_):
                    xw = pad_mel_to_window(x, W).transpose(0, 2, 1)
                    return discriminator.apply(
                        {"params": params}, xw, True,
                        rngs={"dropout": rng_})
                gp = gradient_penalty(disc_scores, d_params, real_p, gen_p,
                                      real_lengths, gen_lengths, k_gp)
                loss = loss + hp.gradient_penalty_lambda * gp
            return loss, dict(discriminator_loss=loss, real_loss=real_loss,
                              fake_loss=fake_loss, gradient_penalty=gp)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.d_params)
        aux["discriminator_grad_norm"] = optax.global_norm(grads)
        updates, d_opt_state = d_tx.update(grads, state.d_opt_state,
                                           state.d_params)
        updates = jax.tree.map(lambda u: -d_lr * u, updates)
        d_params = optax.apply_updates(state.d_params, updates)

        new_state = state.replace(step=state.step + 1, d_params=d_params,
                                  d_opt_state=d_opt_state, rng=rng)
        return new_state, aux

    # ---------------- validation ----------------
    def eval_step(state, batch: Batch, rng):
        k_drop, k_noise = jax.random.split(rng)
        out = generator.apply(
            {"params": state.g_params, "batch_stats": state.g_batch_stats},
            batch.text, batch.text_lengths, batch.mels, batch.speaker,
            batch.emotions, batch.output_lengths, train=False,
            rngs={"dropout": k_drop, "noise": k_noise})
        mel_l, gate_l, attn_l = tacotron2_loss(
            out, (batch.mels, batch.gate), batch.text_lengths,
            batch.output_lengths)
        return dict(mel_loss=mel_l, gate_loss=gate_l, attention_loss=attn_l), out

    return g_step, d_step, eval_step
