"""GAN training loop (reference: train.py:211-466).

The G/D alternation schedule runs in host Python (it is control flow over
compiled steps); all math is inside the jitted steps. Schedule parity:

  * ``gen_warm`` = 5 generator-only warm-up steps;
  * discriminator-only phase until ``disc_warmp_up`` (sampling fakes from the
    ring buffer);
  * afterwards g_freq generator steps alternate with d_freq discriminator
    steps, plus 100 consecutive D steps every 10k iterations
    (reference train.py:297-299);
  * LR halving every ``reduce_lr_steps_every`` iterations;
  * validation + checkpoint every ``iters_per_checkpoint``.

Metrics are logged one step late so the device never waits on the host.
"""

import os
import random as pyrandom
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gantron_tpu.data.dataset import (DataLoader, PrefetchLoader,
                                      SyntheticDataset, TextMelDataset)
from gantron_tpu.parallel import (make_mesh, pad_batch_rows, shard_batch,
                                  shard_state)
from gantron_tpu.parallel.distributed import is_chief
from gantron_tpu.train.checkpoint import CheckpointManager, warm_start_filter
from gantron_tpu.train.state import create_train_state
from gantron_tpu.train.step import make_train_steps
from gantron_tpu.utils.logging import MetricLogger

GEN_WARM = 5
ITER_REP = 10000
DISC_BURST = 100


def is_disc_turn(iteration, gen_times, disc_times, hp, buffer_len):
    """The G/D alternation decision (reference train.py:296-301):
    after 5 generator warm-up steps, the discriminator trains when its
    alternation counter is live, during its warm-up window, or during the
    100-step burst every 10k iterations — provided a generated mel exists."""
    do_disc = iteration >= ITER_REP and iteration % ITER_REP < DISC_BURST
    return (iteration > GEN_WARM
            and (disc_times > 0 or iteration < hp.disc_warmp_up or do_disc)
            and hp.d_freq > 0 and buffer_len > 0)


def advance_counters(d_turn, iteration, gen_times, disc_times, hp):
    """Post-step counter updates (reference train.py:357-359, 420-423)."""
    if d_turn:
        disc_times += 1
        if disc_times > hp.d_freq and iteration >= hp.disc_warmp_up:
            disc_times = 0
            gen_times = 1
    else:
        gen_times += 1
        if gen_times > hp.g_freq and hp.d_freq > 0:
            gen_times = 0
            disc_times = 1
    return gen_times, disc_times


def prepare_dataloaders(hp, wavs_path):
    """(reference train.py:94-111)"""
    if wavs_path == "synthetic":
        # Length ranges follow the configured buckets so every batch collates
        # to a bucket shape (one compile per step type, not one per batch).
        t_in = (max(hp.text_buckets[-1] // 4, 4), hp.text_buckets[-1])
        t_out = (max(hp.mel_buckets[-1] // 3, 8), hp.mel_buckets[-1])
        trainset = SyntheticDataset(hp, size=max(hp.batch_size * 8, 64),
                                    t_in=t_in, t_out=t_out)
        valset = SyntheticDataset(hp, size=max(hp.batch_size * 2, 16),
                                  t_in=t_in, t_out=t_out, seed=1)
    else:
        trainset = TextMelDataset(hp.training_files, hp, wavs_path)
        valset = TextMelDataset(hp.validation_files, hp, wavs_path)
    train_loader = DataLoader(trainset, hp, shuffle=True, drop_last=True)
    val_loader = DataLoader(valset, hp, shuffle=False, drop_last=False)
    return train_loader, val_loader


def validate(eval_step, state, val_loader, mesh, iteration, hp, logger,
             attn_steps, media_dir=None, vocoder=None):
    """Teacher-forced validation (reference train.py:169-208). When
    ``media_dir`` is set, renders alignment/mel/gate plots AND vocoded audio
    for 3 random samples of the last batch (reference logger.py:17-61;
    WaveGlow when provided, Griffin-Lim otherwise)."""
    mel_l = gate_l = attn_l = 0.0
    n = 0
    last = None
    for batch in val_loader:
        if mesh and jax.process_count() > 1:
            # drop_last=False keeps remainder batches; cross-process
            # sharding needs rows % n_devices == 0 (single-process jit
            # tolerates uneven shards, so metrics there are unpadded).
            batch = pad_batch_rows(batch, mesh.size)
        sharded = shard_batch(batch, mesh) if mesh else batch
        metrics, out = eval_step(state, sharded,
                                 jax.random.fold_in(
                                     jax.random.PRNGKey(hp.seed),
                                     iteration + n))
        mel_l += float(metrics["mel_loss"])
        gate_l += float(metrics["gate_loss"])
        attn_l += float(metrics["attention_loss"])
        last = (batch, out)
        n += 1
    if n == 0:
        return float("inf")
    mel_l, gate_l, attn_l = mel_l / n, gate_l / n, attn_l / n
    if iteration > attn_steps:
        attn_l = 0.0

    if media_dir and last is not None:
        _save_validation_media(last, iteration, media_dir, hp, logger,
                               vocoder)
    logger.log_validation(mel_l, gate_l, attn_l, iteration)
    return mel_l + gate_l


def make_vocoder(hp, waveglow_path=None):
    """Validation/inference vocoder: WaveGlow (converted torch weights) when
    a checkpoint is given (reference logger.py:27-31), Griffin-Lim fallback
    otherwise (reference audio_processing.py:59-75). Returns
    ``vocode(mel_bct) -> (B, T_wav) float32``."""
    import jax as _jax

    if waveglow_path:
        from gantron_tpu.models.waveglow import load_waveglow

        waveglow = load_waveglow(waveglow_path)

        def vocode(mel):
            return np.asarray(waveglow.infer(
                jnp.asarray(mel), 0.666, _jax.random.PRNGKey(0)))
        return vocode

    from gantron_tpu.audio.mel import MelSpectrogram, mel_to_wav_griffin_lim

    mel_fn = MelSpectrogram(hp.filter_length, hp.hop_length, hp.win_length,
                            hp.n_mel_channels, hp.sampling_rate, hp.mel_fmin,
                            hp.mel_fmax)

    def vocode(mel):
        return np.asarray(mel_to_wav_griffin_lim(
            jnp.asarray(mel), mel_fn, n_iters=30,
            key=_jax.random.PRNGKey(0)))
    return vocode


def _to_local_host(x):
    """Fetch a jax.Array to host numpy, multi-host safe: a batch-sharded
    global array spans non-addressable devices, so gather only THIS
    process's rows (enough for media sampling)."""
    if not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    if jax.process_count() == 1:
        return np.asarray(x)
    # Deduplicate by shard index: XLA may choose a replicated output sharding
    # for some eval outputs, in which case every local device holds the same
    # rows — concatenating them all would repeat rows n_local_devices times
    # and desync media sample indices from the global batch arrays.
    by_index = {}
    for s in x.addressable_shards:
        by_index.setdefault(
            tuple(sl.start or 0 for sl in s.index), s)
    shards = [by_index[k] for k in sorted(by_index)]
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def _save_validation_media(last, iteration, media_dir, hp, logger=None,
                           vocoder=None):
    import numpy as np  # noqa: F811

    from gantron_tpu.data.wav import write_wav
    from gantron_tpu.utils.plotting import (plot_alignment,
                                            plot_gate_outputs,
                                            plot_spectrogram)

    batch, out = last
    mel_out, mel_post, gates, aligns = (_to_local_host(x) for x in out[:4])
    os.makedirs(media_dir, exist_ok=True)
    B = mel_out.shape[0]
    rnd = pyrandom.Random(iteration)
    idxs = rnd.sample(range(B), min(3, B))
    images, audios = {}, {}
    for j, idx in enumerate(idxs):
        t_in = int(np.asarray(batch.text_lengths)[idx])
        t_out = int(np.asarray(batch.output_lengths)[idx])
        prefix = os.path.join(media_dir, f"iter{iteration}_s{j}")
        plot_alignment(aligns[idx, :t_out, :t_in].T,
                       save_path=prefix + "_align.png")
        plot_spectrogram(mel_post[idx, :, :t_out],
                         np.asarray(batch.mels)[idx, :, :t_out],
                         save_path=prefix + "_mel.png")
        sig = 1.0 / (1.0 + np.exp(-gates[idx, :t_out]))
        plot_gate_outputs(np.asarray(batch.gate)[idx, :t_out], sig,
                          save_path=prefix + "_gate.png")
        images[f"alignment_{j}"] = prefix + "_align.png"
        images[f"mel_{j}"] = prefix + "_mel.png"
        images[f"gate_{j}"] = prefix + "_gate.png"
        if vocoder is not None:
            # Vocode at the batch's padded length (one compile per bucket
            # shape), then cut to the true length.
            wav = vocoder(mel_post[idx : idx + 1])[0]
            wav = wav[: t_out * hp.hop_length]
            write_wav(prefix + ".wav", wav, hp.sampling_rate)
            audios[f"audio_{j}"] = wav
    if logger is not None:
        logger.log_media(iteration, images=images, audios=audios,
                         sample_rate=hp.sampling_rate)


def update_rescue_scale(scale: float, sensor: float, hp) -> float:
    """Collapse-rescue controller step (config.py diversity_rescue_*).

    Two-sided pure host-side feedback on the measured latent-separation
    ratio (eval.sampling.code_separation_ratio — between-code /
    within-code output distance on a decode grid):

    - sensor < ``diversity_rescue_floor``: the latent never took off
      (ratio ~1 = the code is output-invisible; the cold-start saddle) —
      ESCALATE identification pressure by ``diversity_rescue_gain``,
      capped at ``diversity_rescue_max``.
    - sensor > ``diversity_rescue_ceiling``: the code's output effect has
      inflated past what on-manifold mode selection produces — ATTENUATE
      by the gain, floored at 1/``diversity_rescue_max``.
    - healthy band: decay back toward 1 from either side.

    Either bound may be 0 (= that side disabled); both 0 disables the
    controller (always 1.0).

    Why a CEILING detects mode collapse (measured, not assumed —
    scripts/calibrate_rescue_floor.py on 11 composed-study + bimodal
    checkpoints): two prior sensor designs were falsified on real
    collapsed checkpoints. (1) Raw free-running spread is blind — prenet
    dropout keeps spread healthy (collapsed 0.62-0.81 inside the healthy
    band 0.72-1.64) while attribution chi^2 is exactly 0. (2) A LOW
    separation ratio never happens under identification either: the Q
    loss guarantees the code stays decodable from the output, so every
    measured collapse presents as the code controlling an off-manifold
    channel with INFLATED L1 effect (ratio 9.1-18.2) while healthy
    mode-selection stays bounded by real inter-mode distances (2.1-7.6).
    Escalating identification pressure on such a run feeds the
    inflation; attenuation is the corrective."""
    floor = float(getattr(hp, "diversity_rescue_floor", 0.0) or 0.0)
    ceiling = float(getattr(hp, "diversity_rescue_ceiling", 0.0) or 0.0)
    if floor <= 0 and ceiling <= 0:
        return 1.0
    gain = max(float(getattr(hp, "diversity_rescue_gain", 2.0)), 1.0 + 1e-9)
    cap = max(float(getattr(hp, "diversity_rescue_max", 8.0)), 1.0)
    if floor > 0 and sensor < floor:
        return min(scale * gain, cap)
    if ceiling > 0 and sensor > ceiling:
        return max(scale / gain, 1.0 / cap)
    if scale > 1.0:
        return max(scale / gain, 1.0)
    return min(scale * gain, 1.0)


def update_factor_scales(scales, per_dim, hp, iteration=None):
    """Factor-aware rescue controller step (config.py factor_rescue_floor).

    ``scales``: per-code-dim redraw weights (host floats, start at 1.0).
    ``per_dim``: the measured per-dim separation ratios
    (eval.sampling.latent_separation(dim=d) — calibrated on all 6
    factorial checkpoints, scripts/calibrate_factor_sensor.py: min-per-dim
    separates identified 3.47 vs partial/collapsed <= 1.37, floor 2.18).
    A dim below the floor gets its weight multiplied by
    ``diversity_rescue_gain`` (capped at ``diversity_rescue_max``);
    healthy dims decay back toward 1. The weights bias WHERE the subset
    redraw concentrates diversity contrast (train.step.redraw_code), a
    per-dim actuator orthogonal to the diagonal controller's global
    ident_scale — the two cannot issue conflicting commands.

    Before ``factor_rescue_warmup`` iterations the controller is unarmed
    (weights held/decayed to 1.0): separation only exists AFTER
    identification forms, so escalating from iteration 0 pins every dim
    at max gain through the formative phase — measured to harm (1/3 vs
    3/3 joint identification on the factorial corpus). Recovery device,
    not bootstrapping device (config.py factor_rescue_warmup)."""
    floor = float(getattr(hp, "factor_rescue_floor", 0.0) or 0.0)
    if floor <= 0:
        return [1.0] * len(scales)
    warmup = int(getattr(hp, "factor_rescue_warmup", 0) or 0)
    if iteration is not None and iteration < warmup:
        return [1.0] * len(scales)
    gain = max(float(getattr(hp, "diversity_rescue_gain", 2.0)), 1.0 + 1e-9)
    cap = max(float(getattr(hp, "diversity_rescue_max", 8.0)), 1.0)
    out = []
    for s, r in zip(scales, per_dim):
        if r < floor:
            out.append(min(s * gain, cap))
        else:
            out.append(max(s / gain, 1.0))
    return out


def train(output_directory: str, checkpoint_path: Optional[str], warm_start:
          bool, hp, wavs_path: str, logger: Optional[MetricLogger] = None,
          real: float = 1.0, max_seconds: Optional[float] = None,
          waveglow_path: Optional[str] = None):
    """Main entry (reference train.py:211-440)."""
    os.makedirs(output_directory, exist_ok=True)
    # Reference rank-0 gating (train.py:426-431 checkpoints and logs only on
    # rank 0; multiproc.py redirects other ranks): non-chief processes in a
    # multi-host run still execute every collective step (validation is a
    # computation over the global mesh) but write no files/media/checkpoints.
    chief = is_chief()
    if not chief:
        logger = MetricLogger(None, quiet=True)
    logger = logger or MetricLogger(output_directory)
    if (float(getattr(hp, "diversity_rescue_floor", 0.0) or 0.0) > 0
            or float(getattr(hp, "diversity_rescue_ceiling", 0.0) or 0.0)
            > 0):
        # Fail fast: the collapse-rescue controller is a silent no-op
        # without its sensor (the single-process diversity probe) or its
        # actuator (the identification terms ident_scale multiplies).
        if (getattr(hp, "validation_sample_diversity", 0) or 0) < 2 \
                or jax.process_count() > 1:
            raise ValueError(
                "diversity_rescue_floor/ceiling > 0 requires the collapse "
                "detector: set validation_sample_diversity >= 2 (the probe "
                "is single-process only)")
        if not (float(getattr(hp, "diversity_weight", 0.0)) > 0
                or float(getattr(hp, "style_reconstruction_weight",
                                 0.0)) > 0):
            raise ValueError(
                "diversity_rescue_floor/ceiling > 0 requires "
                "diversity_weight > 0 or style_reconstruction_weight > 0: "
                "the rescue scale multiplies exactly those loss terms")
    factor_floor = float(getattr(hp, "factor_rescue_floor", 0.0) or 0.0)
    code_dims_cfg = int(getattr(hp, "style_code_dims", 0) or 0)
    if factor_floor > 0:
        # Fail fast (mirrors the diagonal controller's guards): the
        # factor-aware rescue needs its per-dim sensor (the validation
        # probe) and its actuator (the weighted subset redraw; the
        # incompatible-flag check lives in train.step.make_train_steps).
        if code_dims_cfg < 2:
            raise ValueError(
                "factor_rescue_floor > 0 requires style_code_dims >= 2: "
                "the per-dim sensor is only distinct from the diagonal "
                "one for multi-dim codes (config.py factor_rescue_floor)")
        if (getattr(hp, "validation_sample_diversity", 0) or 0) < 2 \
                or jax.process_count() > 1:
            raise ValueError(
                "factor_rescue_floor > 0 requires the collapse detector: "
                "set validation_sample_diversity >= 2 (the probe is "
                "single-process only)")
        if not float(getattr(hp, "diversity_weight", 0.0)) > 0:
            raise ValueError(
                "factor_rescue_floor > 0 requires diversity_weight > 0: "
                "the per-dim redraw weights bias the diversity pair's "
                "subset redraw")
    mesh = make_mesh(hp.mesh_shape)
    if jax.process_count() > 1 and hp.batch_size % mesh.size != 0:
        # Single-process jit tolerates uneven data sharding (XLA pads);
        # cross-process make_array_from_process_local_data cannot.
        raise ValueError(
            f"batch_size={hp.batch_size} is not divisible by the "
            f"{mesh.size}-device data mesh; adjust batch_size or mesh_shape")
    vocoder = None
    if getattr(hp, "validation_audio", True):
        vocoder = make_vocoder(hp, waveglow_path)

    train_loader, val_loader = prepare_dataloaders(hp, wavs_path)

    sample = next(iter(train_loader))
    rng = jax.random.PRNGKey(hp.seed)
    state, generator, discriminator, g_tx, d_tx = create_train_state(
        hp, rng, tuple(sample))
    g_step_fn, d_step_fn, eval_step_fn = make_train_steps(
        hp, generator, discriminator, g_tx, d_tx, real=real)
    g_step = jax.jit(g_step_fn, donate_argnums=(0,))
    d_step = jax.jit(d_step_fn, donate_argnums=(0,))
    eval_step = jax.jit(eval_step_fn)

    diversity_probe = None
    if (getattr(hp, "validation_sample_diversity", 0) or 0) > 1 \
            and jax.process_count() == 1:
        # Free-running mode-collapse detector (config.py
        # validation_sample_diversity): decode M open-loop samples of one
        # fixed validation text per validation, log their pairwise spread.
        # Teacher-forced val mel is structurally blind to mode collapse
        # (docs/TRAINING_EVIDENCE.md round-4 keep-best probe). Single-process
        # only: this decode runs outside the collective step and would
        # desync a multi-host schedule.
        _probe_batch = next(iter(val_loader), None)
        if _probe_batch is not None:
            M = int(hp.validation_sample_diversity)
            _t_len = max(int(np.asarray(_probe_batch.text_lengths)[0]), 1)
            _probe_text = jnp.asarray(
                np.asarray(_probe_batch.text)[:1, :_t_len], jnp.int32)
            _probe_infer = jax.jit(lambda v, text, style, kd, kn:
                                   generator.apply(
                v, text, style, None, None, hp.max_decoder_steps,
                method=generator.infer, rngs={"dropout": kd, "noise": kn}))
            _use_separation = (
                float(getattr(hp, "diversity_rescue_floor", 0.0) or 0.0) > 0
                or float(getattr(hp, "diversity_rescue_ceiling", 0.0)
                         or 0.0) > 0)

            _factor_dims = (code_dims_cfg if factor_floor > 0
                            and code_dims_cfg >= 2 else 0)

            def diversity_probe(st, it):
                """Returns (spread, separation_ratio | None,
                per_dim_ratios | None)."""
                from gantron_tpu.eval.sampling import (
                    latent_separation, pairwise_sample_distance)

                k = jax.random.fold_in(
                    jax.random.PRNGKey(hp.seed + 17), it)
                variables = {"params": st.g_params,
                             "batch_stats": st.g_batch_stats}
                if _use_separation or _factor_dims:
                    # One grid decode feeds both statistics: the rescue
                    # sensor (scale-free between/within-code ratio) and the
                    # logged free-running spread. The factor-aware sensor
                    # (config.py factor_rescue_floor) adds one grid decode
                    # per code dim — the per-dim sweep the diagonal is
                    # measurably blind without.
                    ratio, spread = latent_separation(
                        generator, variables, hp, _probe_text, k,
                        infer_fn=_probe_infer)
                    per_dim = None
                    if _factor_dims:
                        per_dim = [latent_separation(
                            generator, variables, hp, _probe_text, k,
                            infer_fn=_probe_infer, dim=d)[0]
                            for d in range(_factor_dims)]
                    return spread, ratio, per_dim
                text = jnp.broadcast_to(_probe_text, (M, _probe_text.shape[1]))
                out = _probe_infer(
                    variables, text, None,
                    jax.random.fold_in(k, 0), jax.random.fold_in(k, 1))
                return pairwise_sample_distance(
                    np.asarray(out[1]), np.asarray(out[4])), None, None

    rescue_scale = 1.0
    # Factor-aware rescue state (config.py factor_rescue_floor): per-dim
    # redraw weights, updated at each validation from the per-dim
    # separation probe, passed (normalized) into the g-step's subset
    # redraw. All-ones = the unweighted redraw.
    factor_scales = [1.0] * (code_dims_cfg if factor_floor > 0 else 0)

    ckpt = CheckpointManager(output_directory)
    iteration = 0
    g_lr, d_lr = hp.g_learning_rate, hp.d_learning_rate
    if checkpoint_path is None and not warm_start:
        # Auto-resume: a preempted run restarted with the same command picks
        # up from the newest checkpoint in its output directory.
        latest = ckpt.latest()
        if latest is not None:
            logger.info(f"Auto-resuming from {latest}")
            checkpoint_path = latest
    if checkpoint_path is not None:
        if warm_start:
            # Raw (template-free) restore: warm starts typically cross
            # configs whose layer shapes differ.
            from gantron_tpu.utils.loading import load_checkpoint_tree

            payload = load_checkpoint_tree(checkpoint_path)
            state = state.replace(
                g_params=warm_start_filter(
                    state.g_params, payload["state"]["g_params"],
                    hp.ignore_layers))
            # The reference's warm start goes through load_state_dict, which
            # carries BatchNorm running stats too (train.py:128-140); fresh
            # mean-0/var-1 stats would cripple eval-mode conv stacks.
            if "g_batch_stats" in payload.get("state", {}):
                state = state.replace(
                    g_batch_stats=warm_start_filter(
                        state.g_batch_stats,
                        payload["state"]["g_batch_stats"], hp.ignore_layers))
        else:
            state = ckpt.restore(checkpoint_path, state)
            # state.step == completed steps == the iteration counter at save
            # time (both increment once per batch); the next batch's index
            # IS state.step — a +1 here would skip one schedule index per
            # resume and train one step fewer than an uninterrupted run.
            iteration = int(np.asarray(state.step))
            if hp.use_saved_learning_rate:
                # Restore the LRs stored with the checkpoint (reference
                # train.py:266-269) — NOT a schedule reconstruction, so
                # off-schedule adjustments survive a resume.
                meta = CheckpointManager.load_meta(checkpoint_path)
                if meta is not None:
                    g_lr = float(meta.get("g_lr", g_lr))
                    d_lr = float(meta.get("d_lr", d_lr))

    if jax.process_count() > 1:
        # Chief-only checkpointing means only the chief may have found a
        # checkpoint (no shared FS required): broadcast the chief's state,
        # iteration, and LRs so every process resumes identically — a
        # divergent iteration counter would desync the G/D schedule and
        # deadlock the collectives.
        from jax.experimental import multihost_utils

        state, (iteration, g_lr, d_lr) = multihost_utils.broadcast_one_to_all(
            (jax.device_get(state),
             np.asarray([iteration, g_lr, d_lr], np.float64)))
        iteration, g_lr, d_lr = int(iteration), float(g_lr), float(d_lr)
        if max_seconds is not None:
            # Per-process wall clocks disagree; one process stopping while
            # another continues would hang the cluster mid-collective.
            logger.info("max_seconds ignored in multi-process runs "
                        "(iteration-based stopping only)")
            max_seconds = None

    state = shard_state(state, mesh)

    n_epochs = hp.epochs
    if hp.iterations is not None and hp.iterations > 0:
        n_epochs = int(hp.iterations / max(len(train_loader), 1)) + 1

    gen_times, disc_times = 1, 0
    generated_mel_list = []  # ring buffer of (mel, lengths), ≤ d_freq
    pending_log = None  # (step, dict) logged one step late
    t_start = time.time()
    rnd = pyrandom.Random(hp.seed)

    def validate_and_save():
        """Collective validation on every process; chief-only media+save."""
        val_loss = validate(eval_step, state, val_loader, mesh, iteration,
                            hp, logger, hp.attn_steps,
                            media_dir=os.path.join(output_directory, "media")
                            if chief else None,
                            vocoder=vocoder)
        if diversity_probe is not None:
            nonlocal rescue_scale, factor_scales
            diversity, separation, per_dim = diversity_probe(
                state, iteration)
            extra_vals = {}
            if separation is not None:
                # The controller's sensor is the separation ratio, never
                # the raw spread (measured blind to latent collapse — see
                # update_rescue_scale).
                rescue_scale = update_rescue_scale(
                    rescue_scale, separation, hp)
                extra_vals["identification_separation"] = separation
                extra_vals["identification_rescue_scale"] = rescue_scale
            if per_dim is not None:
                factor_scales = update_factor_scales(
                    factor_scales, per_dim, hp, iteration)
                for d, (r, s) in enumerate(zip(per_dim, factor_scales)):
                    extra_vals[f"identification_separation_dim{d}"] = r
                    extra_vals[f"factor_rescue_scale_dim{d}"] = s
            logger.log_values(iteration, sample_diversity=diversity,
                              **extra_vals)
        if chief:
            path = ckpt.save(jax.device_get(state), iteration, val_loss,
                             extra={"g_lr": g_lr, "d_lr": d_lr})
            logger.save_file(path)
        return val_loss

    def flush_log():
        nonlocal pending_log
        if pending_log is not None:
            step_i, metrics = pending_log
            # One bulk transfer instead of a device round-trip per scalar.
            host = jax.device_get(metrics)
            host = {k: float(v) for k, v in host.items()}
            logger.log_values(step_i, **host)
            key = ("generator_loss" if "generator_loss" in host
                   else "discriminator_loss")
            logger.progress(step_i, hp.iterations, **{key: host[key]})
            pending_log = None

    for epoch in range(n_epochs):
        for batch in PrefetchLoader(train_loader):
            start = time.perf_counter()
            sharded = shard_batch(batch, mesh)
            d_turn = is_disc_turn(iteration, gen_times, disc_times, hp,
                                  len(generated_mel_list))

            if d_turn:
                idx = min(disc_times - 1, len(generated_mel_list) - 1)
                gen_mel, gen_lengths = generated_mel_list[idx]
                if iteration < hp.disc_warmp_up:
                    gen_mel, gen_lengths = rnd.choice(generated_mel_list)
                # Pad both mels to the largest bucket: collapses the
                # (real bucket x fake bucket) d_step compile combinations to
                # one; the D step costs ~8 ms, the padding is masked out by
                # the per-sample valid-window counts.
                T_max = max(hp.mel_buckets[-1], sharded.mels.shape[2],
                            gen_mel.shape[2])
                T_max = -(-T_max // hp.discriminator_window) * \
                    hp.discriminator_window
                pad_to = lambda m: jnp.pad(
                    m, ((0, 0), (0, 0), (0, T_max - m.shape[2])))
                state, metrics = d_step(state, pad_to(sharded.mels),
                                        sharded.output_lengths,
                                        pad_to(gen_mel),
                                        gen_lengths, jnp.float32(d_lr))
                flush_log()
                metrics["discriminator_learning_rate"] = d_lr
                metrics["discriminator_duration"] = (
                    time.perf_counter() - start)
                pending_log = (iteration, metrics)
            else:
                attn_w = 10.0 if iteration < hp.attn_steps else 0.0
                # Identification warm-up (config.py identification_warmup):
                # hold the InfoGAN terms at 0 until D has anchored the
                # manifold; a traced scalar like attn_w, so flipping it at
                # the boundary recompiles nothing. Past warm-up the scale is
                # the collapse-rescue controller's (1.0 unless
                # diversity_rescue_floor is set and the probe trips).
                ident_w = 0.0 if iteration < int(getattr(
                    hp, "identification_warmup", 0)) else rescue_scale
                if factor_scales:
                    # Traced vector — updating it at a validation boundary
                    # recompiles nothing (redraw_code dim_weights).
                    state, metrics, fake_pair = g_step(
                        state, sharded, jnp.float32(g_lr),
                        jnp.float32(attn_w), jnp.float32(ident_w),
                        jnp.asarray(factor_scales, jnp.float32))
                else:
                    state, metrics, fake_pair = g_step(
                        state, sharded, jnp.float32(g_lr),
                        jnp.float32(attn_w), jnp.float32(ident_w))
                # (mel, lengths): teacher-forced mel + batch lengths, or the
                # free-running rollout + gate lengths under
                # hp.adversarial_rollouts (see train.step.g_step).
                generated_mel_list.append(fake_pair)
                if len(generated_mel_list) > max(hp.d_freq, 1):
                    generated_mel_list.pop(0)
                flush_log()
                if iteration >= hp.attn_steps:
                    metrics.pop("attention_loss", None)
                metrics["generator_learning_rate"] = g_lr
                metrics["generation_duration"] = time.perf_counter() - start
                pending_log = (iteration, metrics)

            gen_times, disc_times = advance_counters(
                d_turn, iteration, gen_times, disc_times, hp)
            iteration += 1

            validated_at = -1
            if iteration % hp.iters_per_checkpoint == 0:
                flush_log()
                validate_and_save()
                validated_at = iteration

            if (hp.reduce_lr_steps_every > 0
                    and iteration % int(hp.reduce_lr_steps_every) == 0):
                g_lr /= 2
                d_lr /= 2

            stop = ((hp.iterations is not None and hp.iterations > 0
                     and iteration >= hp.iterations)
                    or (max_seconds and time.time() - t_start > max_seconds))
            if stop:
                flush_log()
                if validated_at != iteration:  # avoid double validate+save
                    validate_and_save()
                return state, iteration
    flush_log()
    return state, iteration
