"""Forced-style/emotion sample generation (reference: inference_samples.py).

``force_style_emotions`` generates ``n_groups`` groups of samples where the
emotion vector and/or the noise style is held fixed per group, saving one
``.npy`` mel per sample and counting decoder-cap hits
(reference inference_samples.py:42-126).

TPU-first deviation: the reference loops one sample at a time; here each
group's samples run as ONE batched inference call (per-sample noise drawn in
the batch), which is dramatically faster on the MXU with identical outputs
per sample.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

PREDEFINED_EMOTIONS = np.array([
    # [Neutral, Angry, Happy, Sad, Fearful]
    [0.6, 0, 0, 0, 0],
    [0, 0.7, 0, 0, 0],
    [0, 0, 0.5, 0, 0],
    [0, 0, 0, 0.8, 0],
    [0, 0, 0, 0, 0.75],
], np.float32)

INT_EMOTIONS = np.array([
    [1, 0, 0, 0, 0], [0, 1, 0, 0, 0], [0, 0, 1, 0, 0],
    [0, 0, 0, 1, 0], [0, 0, 0, 0, 1], [0, 0, 0, 0, 0],
], np.float32)


def group_emotions(n_groups, int_emotions, predefined, key):
    """Per-group emotion vectors (reference inference_samples.py:70-93)."""
    if int_emotions:
        if n_groups > 6:
            raise ValueError("only 6 integer emotion combinations exist")
        return INT_EMOTIONS[:n_groups].copy()
    if predefined:
        extra = jax.random.uniform(key, (max(n_groups - 5, 0), 5))
        return np.concatenate([PREDEFINED_EMOTIONS[:min(n_groups, 5)],
                               np.asarray(extra)], axis=0)[:n_groups]
    return np.asarray(jax.random.uniform(key, (n_groups, 5)))


def force_style_emotions(model, variables, input_sequence, output_path,
                         speaker=None, force_emotions=True, force_style=True,
                         style_shape=None, n_groups=6, n_samples_styles=20,
                         simple_name=False, int_emotions=False,
                         predefined=False, encoder_input=False,
                         max_decoder_steps=500, key=None):
    """Generate and save grouped samples; returns the number of samples that
    hit the decoder cap (the 'generation error' count)."""
    os.makedirs(output_path, exist_ok=True)
    key = key if key is not None else jax.random.PRNGKey(0)
    k_emo, k_style, k_run = jax.random.split(key, 3)

    T_in = input_sequence.shape[1]
    noise_size = style_shape[1] if style_shape else 0

    emotions = (group_emotions(n_groups, int_emotions, predefined, k_emo)
                if force_emotions else None)
    styles = (np.asarray(jax.random.uniform(k_style,
                                            (n_groups, 1, noise_size)))
              if force_style else None)

    B = n_samples_styles
    text_batch = jnp.broadcast_to(input_sequence, (B, T_in))
    speaker_batch = (jnp.broadcast_to(speaker, (B,))
                     if speaker is not None else None)

    max_decoder_steps_reached = 0
    for g in range(n_groups):
        emotion = (jnp.broadcast_to(jnp.asarray(emotions[g]), (B, 5))
                   if emotions is not None else None)
        style = (jnp.broadcast_to(jnp.asarray(styles[g][None]),
                                  (B, 1, noise_size))
                 if styles is not None else None)
        out = model.apply(
            variables, text_batch, style, emotion, speaker_batch,
            max_decoder_steps, method=model.infer,
            rngs={"dropout": jax.random.fold_in(k_run, 2 * g),
                  "noise": jax.random.fold_in(k_run, 2 * g + 1)})
        mel_post = np.asarray(out[1])  # (B, n_mel, S)
        lengths = np.asarray(out[4])

        for i in range(B):
            L = int(lengths[i])
            if L >= max_decoder_steps:
                max_decoder_steps_reached += 1
            if simple_name:
                name = f"{g}-{i}"
                if emotions is not None:
                    name += "-" + ",".join(
                        str(round(float(v), 2)) for v in emotions[g])
            else:
                name = ""
                if force_emotions:
                    name += f"emotion-{g}-"
                if force_style:
                    name += f"style-{g}-"
                if not name:
                    # With neither force flag the reference names every
                    # group's samples identically and groups overwrite each
                    # other (inference_samples.py:118-123); keep the group
                    # prefix so all n_groups*B mels survive.
                    name = f"group-{g}-"
                name += f"{i}"
            np.save(os.path.join(output_path, f"{name}.npy"),
                    mel_post[i, :, :L])

    return max_decoder_steps_reached


def coded_style(key, n_samples, noise_size, code, code_dims=1,
                code_levels=2):
    """Style batch with the identifiable code pinned to a chosen level.

    The round-4 identification campaign (docs/TRAINING_EVIDENCE.md) makes
    the first ``style_code_dims`` dims of the injected style vector a
    discrete InfoGAN code drawn from the grid ``(k + 0.5) / L`` — the
    measured mode controller. This helper builds the serving-side
    counterpart: a ``(n_samples, 1, noise_size)`` style whose code dims are
    pinned to level ``code`` and whose remaining nuisance dims draw
    U[0, 1) from ``key``. Pass it as ``style=`` to ``Tacotron2.infer`` /
    ``Synthesizer.infer_mel``/``tts`` to generate a chosen mode; vary
    ``key`` to sample diverse utterances WITHIN that mode.

    ``code``: int level in ``[0, code_levels)``, broadcast to every sample
    and code dim; or ``(n_samples,)`` per-sample levels (a code sweep in
    one batch, all code dims sharing the sample's level); or
    ``(code_dims,)`` / ``(n_samples, code_dims)`` per-DIM levels — the
    training draw samples each code dim independently (step.py
    _draw_code), so for ``code_dims > 1`` the trained grid has
    ``code_levels ** code_dims`` cells and only the per-dim forms can
    reach the off-diagonal ones. ``code_dims``/``code_levels`` must match
    the training config (config.py ``style_code_dims``/
    ``style_code_levels``); the reference has no equivalent — its noise
    input is injected but never identified (reference model.py:184-191,
    273-279; train.py:371-383).
    """
    if not 0 < code_dims <= noise_size:
        raise ValueError(
            f"code_dims={code_dims} must be in [1, noise_size={noise_size}]"
            " (the code is a prefix of the style vector)")
    if code_levels < 2:
        raise ValueError(
            f"code_levels={code_levels}: a pinnable code needs >= 2 levels")
    code = jnp.asarray(code, jnp.int32)
    if code.ndim == 0:
        code = jnp.broadcast_to(code, (n_samples, code_dims))
    elif code.shape == (n_samples,) and code_dims != n_samples:
        code = jnp.broadcast_to(code[:, None], (n_samples, code_dims))
    elif code.shape == (code_dims,):
        code = jnp.broadcast_to(code[None, :], (n_samples, code_dims))
    if code.shape != (n_samples, code_dims):
        raise ValueError(
            f"code shape {code.shape} is none of (), ({n_samples},), "
            f"({code_dims},), ({n_samples}, {code_dims}): pass one level, "
            "per-sample levels, per-dim levels, or the full grid")
    grid = (code.astype(jnp.float32) + 0.5) / code_levels
    style = jax.random.uniform(key, (n_samples, 1, noise_size))
    return style.at[:, 0, :code_dims].set(grid)


def attribution_level_grid(model, variables, hp, input_sequence, channels,
                           n_styles, n_dropout, seed=0,
                           max_decoder_steps=None):
    """(N styles) x (M dropout keys) grid of scalar band levels of one text.

    The decode half of the noise-vs-dropout attribution instrument
    (eval.mode_study.attribution_grid_stats scores the grid): each cell is
    one free-running decode with style i injected deterministically (the
    latent axis) and dropout key j (the nuisance axis). ONE definition of
    the key schedule shared by scripts/mode_attribution.py and
    scripts/gan_factorial_study.py so the studies can never silently
    score differently-constructed grids. ``channels`` is one mel-channel
    index array -> returns (N, M); or a list/tuple of B such arrays ->
    returns (N, M, B), every band scored on the SAME decode grid (the
    factorial study's per-band + joint attribution needs exactly that).
    """
    from gantron_tpu.eval.mode_study import hiband_level

    bands = (list(channels) if isinstance(channels, (list, tuple))
             else [channels])
    N, M = n_styles, n_dropout
    max_steps = max_decoder_steps or hp.max_decoder_steps
    text_batch = jnp.broadcast_to(jnp.asarray(input_sequence),
                                  (N, input_sequence.shape[1]))
    key = jax.random.PRNGKey(100 + seed)
    k_style, k_drop = jax.random.split(key)
    # One style row per latent draw, identical across the M calls.
    styles = jax.random.uniform(k_style, (N, 1, hp.noise_size))
    infer = jax.jit(lambda v, text, style, kd, kn: model.apply(
        v, text, style, None, None, max_steps,
        method=model.infer, rngs={"dropout": kd, "noise": kn}))
    levels = np.zeros((N, M, len(bands)))
    for j in range(M):
        kd = jax.random.fold_in(k_drop, j)
        out = infer(variables, text_batch, styles, kd,
                    jax.random.fold_in(kd, 999))  # noise rng unused w/ style
        mels = np.asarray(out[1])
        lens = np.asarray(out[4])
        for i in range(N):
            m = mels[i, :, : max(int(lens[i]), 2)]
            for b, ch in enumerate(bands):
                levels[i, j, b] = hiband_level(m, ch)
    if not isinstance(channels, (list, tuple)):
        return levels[:, :, 0]
    return levels


def random_style(model, variables, input_sequence, noise_size, n_samples,
                 use_labels=False, speaker=None, key=None,
                 max_decoder_steps=500):
    """Free sampling with random style/emotions per sample
    (reference inference_samples.py:129-143). Returns (mels, lengths)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    B = n_samples
    T_in = input_sequence.shape[1]
    text_batch = jnp.broadcast_to(input_sequence, (B, T_in))
    speaker_batch = (jnp.broadcast_to(speaker, (B,))
                     if speaker is not None else None)
    out = model.apply(
        variables, text_batch, None, None, speaker_batch, max_decoder_steps,
        method=model.infer,
        rngs={"dropout": jax.random.fold_in(key, 0),
              "noise": jax.random.fold_in(key, 1)})
    return np.asarray(out[1]), np.asarray(out[4])


def pairwise_sample_distance(mels, lengths):
    """Mean pairwise masked L1 distance between free-running samples of the
    SAME text — the mode-collapse detector behind
    ``validation_sample_diversity`` (config.py). Per pair, the distance is
    averaged over the pair's max emitted length (the same masking as the
    training diversity term, train/step.py d_out): frames where one decode
    has stopped and the other hasn't still count, but post-stop zero padding
    common to both does not dilute the statistic. ~0 across independent
    noise/dropout draws = the sampler has collapsed to one output — a
    failure teacher-forced validation loss cannot see, because it conditions
    every frame on real history (measured: docs/TRAINING_EVIDENCE.md
    round-4 keep-best probe).

    mels: (B, n_mels, T) array; lengths: (B,) emitted frame counts.
    Returns a float (0.0 when B < 2).
    """
    mels = np.asarray(mels, np.float32)
    lengths = np.asarray(lengths)
    B, n_mels, T = mels.shape
    dists = []
    for i in range(B):
        for j in range(i + 1, B):
            pair_len = int(max(lengths[i], lengths[j], 1))
            d = np.abs(mels[i, :, :pair_len] - mels[j, :, :pair_len])
            dists.append(d.sum() / (n_mels * pair_len))
    return float(np.mean(dists)) if dists else 0.0


def _masked_l1(mels, lengths, i, j):
    """Masked per-frame L1 between grid rows i and j (the
    pairwise_sample_distance pair metric)."""
    n_mels = mels.shape[1]
    pair_len = int(max(lengths[i], lengths[j], 1))
    d = np.abs(mels[i, :, :pair_len] - mels[j, :, :pair_len])
    return float(d.sum() / (n_mels * pair_len))


def code_separation_ratio(mels, lengths, n_levels, n_draws):
    """Latent-collapse sensor: between-code / within-code distance ratio.

    Input is a LEVEL-MAJOR decode grid of one text — row ``l * n_draws + s``
    is latent level ``l`` under nuisance draw ``s`` (styles from
    ``separation_grid_styles``, so same-draw rows share their nuisance
    dims). Two pair populations:

    - BETWEEN: same draw, different level — rows differing ONLY in the
      identifiable latent (plus dropout).
    - WITHIN: same level, different draw — rows differing in nuisance
      noise and dropout but NOT the latent.

    Healthy identification: the latent moves the output more than nuisance
    does -> ratio > 1. Latent collapse: the code is ignored, so same-draw
    cross-level pairs differ by dropout alone -> ratio <= ~1. The ratio is
    scale-free, which is what the round-4 calibration showed the raw spread
    is not: collapsed checkpoints keep healthy-looking free-running spread
    because prenet dropout supplies diversity the latent no longer does
    (docs/evidence_r4, rescue_floor_calibration.json: collapsed spreads
    0.62-0.81 INSIDE the healthy band 0.72-1.64, while this ratio separates
    0.0-chi^2 arms from >100-chi^2 arms cleanly).

    mels: (n_levels * n_draws, n_mel, T); lengths: matching emitted counts.
    """
    mels = np.asarray(mels, np.float32)
    lengths = np.asarray(lengths)
    between, within = [], []
    for l in range(n_levels):
        for s in range(n_draws):
            i = l * n_draws + s
            for l2 in range(l + 1, n_levels):
                between.append(_masked_l1(mels, lengths, i,
                                          l2 * n_draws + s))
            for s2 in range(s + 1, n_draws):
                within.append(_masked_l1(mels, lengths, i,
                                         l * n_draws + s2))
    b = float(np.mean(between)) if between else 0.0
    w = float(np.mean(within)) if within else 0.0
    return b / max(w, 1e-8)


def separation_grid_styles(hp, n_levels, n_draws, key, dim=None):
    """Level-major (n_levels * n_draws, 1, noise_size) style grid for the
    latent-separation probe — ONE construction shared by the in-loop
    collapse-rescue sensor (train/loop.py) and the offline calibration
    (scripts/calibrate_rescue_floor.py), so the floor is always calibrated
    on the exact statistic the controller consumes.

    Discrete-code configs (style_code_dims > 0): nuisance dims are drawn
    once per draw and SHARED across levels; the code dims sweep the
    training grid ``(l + 0.5) / style_code_levels`` (step.py _draw_code).
    Continuous configs: each level is one full random style vector shared
    across draws (within-level variation is dropout only).

    ``dim`` (discrete-code configs only): sweep ONLY code dim ``dim``
    across the levels; the OTHER code dims are drawn from the training
    grid once per draw and shared across levels — the factor-aware form
    (scripts/calibrate_factor_sensor.py): between-level contrast then
    isolates what dim ``dim`` alone moves. Default ``None`` keeps the
    diagonal sweep (all code dims together), the calibrated single-factor
    sensor.
    """
    import jax
    import jax.numpy as jnp

    L, S = n_levels, n_draws
    code_dims = int(getattr(hp, "style_code_dims", 0) or 0)
    code_levels = int(getattr(hp, "style_code_levels", 0) or 0)
    if code_dims > 0 and code_levels >= 2:
        # NOTE: dim=None must keep drawing nuisance from `key` directly —
        # the committed ceiling calibration (rescue_floor_calibration.json)
        # was measured on exactly these draws.
        nuis = jax.random.uniform(key, (S, 1, hp.noise_size))
        style = jnp.tile(nuis, (L, 1, 1))  # level-major
        # L may be capped below code_levels; spread the probed levels over
        # the trained range.
        lvls = np.round(np.linspace(0, code_levels - 1, L)).astype(np.int32)
        grid = jnp.repeat((jnp.asarray(lvls, jnp.float32) + 0.5)
                          / code_levels, S)
        if dim is None:
            style = style.at[:, 0, :code_dims].set(
                jnp.broadcast_to(grid[:, None], (L * S, code_dims)))
            return style
        if not 0 <= dim < code_dims:
            raise ValueError(f"dim={dim} not in [0, code_dims={code_dims})")
        other = (jax.random.randint(jax.random.fold_in(key, dim + 1),
                                    (S, 1, code_dims), 0,
                                    code_levels).astype(jnp.float32)
                 + 0.5) / code_levels
        style = style.at[:, :, :code_dims].set(jnp.tile(other, (L, 1, 1)))
        return style.at[:, 0, dim].set(grid)
    per_level = jax.random.uniform(key, (L, 1, hp.noise_size))
    return jnp.repeat(per_level, S, axis=0)


def probe_grid_shape(hp):
    """(n_levels, n_draws) for the latent-separation probe, sized so the
    grid costs about the same as the ``validation_sample_diversity``-row
    spread probe it extends."""
    M = max(int(getattr(hp, "validation_sample_diversity", 0) or 0), 4)
    code_levels = int(getattr(hp, "style_code_levels", 0) or 0)
    if int(getattr(hp, "style_code_dims", 0) or 0) > 0 and code_levels >= 2:
        L = min(code_levels, 4)
    else:
        L = 2
    return L, max(M // L, 2)


def latent_separation(model, variables, hp, text, key, infer_fn=None,
                      dim=None):
    """Decode the separation grid of one text and return
    ``(separation_ratio, spread)``.

    ``text``: (1, T) int32 ids. ``infer_fn``: optional pre-jitted
    ``f(variables, text_batch, style, k_dropout, k_noise)`` matching
    ``Tacotron2.infer`` (train/loop.py passes its cached closure; offline
    callers omit it). ``spread`` is pairwise_sample_distance over ALL grid
    rows — the free-running diversity statistic, logged alongside.
    ``dim``: probe a single code dim (separation_grid_styles docstring) —
    the factor-aware form for multi-dim codes.
    """
    import jax
    import jax.numpy as jnp

    L, S = probe_grid_shape(hp)
    k_style, k_run = jax.random.split(key)
    style = separation_grid_styles(hp, L, S, k_style, dim=dim)
    text_batch = jnp.broadcast_to(jnp.asarray(text, jnp.int32),
                                  (L * S, text.shape[1]))
    if infer_fn is None:
        infer_fn = jax.jit(lambda v, t, st, kd, kn: model.apply(
            v, t, st, None, None, hp.max_decoder_steps,
            method=model.infer, rngs={"dropout": kd, "noise": kn}))
    out = infer_fn(variables, text_batch, style,
                   jax.random.fold_in(k_run, 0), jax.random.fold_in(k_run, 1))
    mels, lengths = np.asarray(out[1]), np.asarray(out[4])
    ratio = code_separation_ratio(mels, lengths, L, S)
    return ratio, pairwise_sample_distance(mels, lengths)
