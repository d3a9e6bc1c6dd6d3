#!/usr/bin/env python
"""Identification scaling: does the latent code survive a PRODUCT space?

The round-4 campaign identified ONE hidden bit (bimodal + composed corpora,
chi^2 p < 1e-6; docs/TRAINING_EVIDENCE.md). Real one-to-many structure is
factorial — several independent hidden factors at once — so this study
trains on ``data.toy.build_factorial_corpus`` (two independent hidden bits
on disjoint bands: A = [4.0, 4.8] kHz, B >= 5.4 kHz; 4 joint modes) and
asks three questions the single-bit studies cannot:

  * SCALING — does the endpoint config (`bit_warm`: rollouts + discrete
    code + identification warmup) still identify when the latent space is
    2 bits? Scored like the composed study: a random-style (N x M) grid,
    per-band attribution + the 4-way joint attribution
    (eval.mode_study.attribution_grid_stats_multi).
  * COVERAGE — can the trained code grid REACH all 4 joint modes
    (eval.mode_study.code_mode_coverage on a coded_style decode grid)?
    A 1-dim 4-level code (`bit4`) has exactly 4 cells for 4 modes; a
    2-dim 2-level code (`bit2x2`) must factorize to cover.
  * DISENTANGLEMENT — for `bit2x2`, does each code dim bind to ONE bit
    (eval.mode_study.code_binding_stats: binding matrix, modularity,
    injective assignment)? `bit1` is the underparameterized probe: a
    1-bit code facing 2 factors — which one does it latch onto?

The reference cannot pose any of these questions: its noise input is
injected but never identified (reference model.py:184-191, 273-279;
train.py:371-383 only scores teacher-forced outputs).

Usage: python scripts/gan_factorial_study.py --variant bit4 --seed 0
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_BIT_WARM = {
    "adversarial_rollouts": True,
    "style_reconstruction_weight": 10.0,
    "diversity_weight": 1.0,
    "diversity_cap": 0.9,
    "identification_warmup": 1000,
    # The shipped endpoint includes the collapse-rescue controller
    # (docs/TRAINING_EVIDENCE.md "Closed-loop rescue"); its ceiling was
    # calibrated on the single-bit corpora — the logged
    # identification_separation trajectory shows whether the band holds
    # on a product latent space.
    "diversity_rescue_ceiling": 8.3,
    "validation_sample_diversity": 8,
}

VARIANTS = {
    # One 4-level code dim: the product space as a flat categorical.
    "bit4": dict(_BIT_WARM, style_code_dims=1, style_code_levels=4),
    # Two 2-level code dims: identification can only cover the product
    # space by FACTORIZING (each dim taking one bit).
    "bit2x2": dict(_BIT_WARM, style_code_dims=2, style_code_levels=2),
    # Underparameterized: one 2-level dim facing two hidden bits.
    "bit1": dict(_BIT_WARM, style_code_dims=1, style_code_levels=2),
    # The measured-failure fix arm: the base bit2x2 arms collapse or bind
    # one band because the all-dims diversity redraw only ever produces
    # the joint flip, whose output contrast (2.17 L1 on this corpus) a
    # SINGLE band's change (1.23) already saturates past diversity_cap —
    # the second code dim never owes any contrast. Subset redraw
    # (config.py diversity_subset_redraw) makes single-dim pairs that owe
    # the full cap on their own.
    "bit2x2_subset": dict(_BIT_WARM, style_code_dims=2, style_code_levels=2,
                          diversity_subset_redraw=True),
    # Modularity arm (config.py code_modularity_weight): the measured
    # subset-arm failures are factor collapse (a dead dim) and entangled
    # binding (both dims driving one band, joint-identified at coverage
    # 0.5-0.75). The modularity triple decodes base + dim-i flip +
    # dim-j flip, makes EVERY dim owe the full saturating contrast every
    # step (strictly stronger than the random subset), and pushes the two
    # per-dim output deltas orthogonal (the Hessian-Penalty-style
    # off-diagonal term) — the direct pressure toward axis-aligned,
    # collapse-free binding.
    "bit2x2_mod": dict(_BIT_WARM, style_code_dims=2, style_code_levels=2,
                       diversity_subset_redraw=True,
                       code_modularity_weight=1.0),
    # Additivity arm (config.py code_additivity_weight): the mixed-second-
    # difference form — G(z_ij) must land where the two single flips
    # compose. Unlike the |cos| surrogate (near-orthogonality is free for
    # noise-like deltas in a high-dim mel space), additivity demands
    # deterministic, composable per-dim effects and directly pressures
    # every joint mode to be reachable.
    "bit2x2_add": dict(_BIT_WARM, style_code_dims=2, style_code_levels=2,
                       diversity_subset_redraw=True,
                       code_additivity_weight=1.0),
    # Reward-shaped binding (config.py code_orthogonal_reward): the subset
    # config with each single-dim flip's diversity contrast SCALED by the
    # sine between the two per-dim output deltas — entangled effects earn
    # nothing, dead effects earn nothing, only live orthogonal effects
    # collect. Designed after BOTH binding penalties measured as collapse
    # accelerants (a zero code effect satisfies any structure penalty;
    # docs/TRAINING_EVIDENCE.md "Binding penalties").
    "bit2x2_ortho": dict(_BIT_WARM, style_code_dims=2, style_code_levels=2,
                         diversity_subset_redraw=True,
                         code_orthogonal_reward=True),
    # Factor-aware rescue arm (config.py factor_rescue_floor): the subset
    # config plus the calibrated per-dim collapse controller — when a code
    # dim's per-dim separation ratio falls below the 6/6-calibrated floor
    # (2.18), the weighted subset redraw concentrates diversity contrast
    # on that dim. Tests whether the round's closed-loop rescue transfers
    # to FACTOR collapse (the diagonal controller is measurably blind).
    "bit2x2_rescue": dict(_BIT_WARM, style_code_dims=2, style_code_levels=2,
                          diversity_subset_redraw=True,
                          factor_rescue_floor=2.18,
                          # Explicit: this is the historical REDRAW arm
                          # (config.py's default flipped to "recon" after
                          # this arm measured the redraw harmful).
                          factor_rescue_actuator="redraw"),
    # Recon actuator (config.py factor_rescue_actuator): same sensor and
    # controller, but the weights escalate the weak dim's per-dim
    # Q-head reconstruction error instead of biasing the redraw — the
    # redraw actuator measurably starves the healthy dim (the diversity
    # reward is zero-sum across dims); identification pressure is not.
    "bit2x2_rescue_q": dict(_BIT_WARM, style_code_dims=2,
                            style_code_levels=2,
                            diversity_subset_redraw=True,
                            factor_rescue_floor=2.18,
                            factor_rescue_actuator="recon"),
    # The MSE identification floor.
    "nogan": {"d_freq": 0, "disc_warmp_up": 0},
}

STUDY_TEXT = "aeioumnst"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", choices=sorted(VARIANTS), default="bit4")
    parser.add_argument("-o", "--output", default="/tmp/factorialstudy")
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--n_utts", type=int, default=200)
    parser.add_argument("--n_styles", type=int, default=16)
    parser.add_argument("--n_dropout", type=int, default=8)
    parser.add_argument("--code_draws", type=int, default=8,
                        help="nuisance draws per code cell for the "
                             "coverage/binding grid")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hparams", type=str, default=None)
    parser.add_argument("--analyze_only", action="store_true")
    args = parser.parse_args()

    from gantron_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from _study_common import final_validation, small_model_params
    from gantron_tpu.config import HParams
    from gantron_tpu.data.toy import (MODEBAND_SCORE, TEXBAND_SCORE,
                                      build_factorial_corpus)
    from gantron_tpu.eval.mode_study import (attribution_grid_stats,
                                             attribution_grid_stats_multi,
                                             band_channels,
                                             code_binding_stats,
                                             code_mode_coverage,
                                             compute_real_anchors,
                                             hiband_level, joint_mode_grid)
    from gantron_tpu.eval.sampling import attribution_level_grid
    from gantron_tpu.text import text_to_sequence
    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.loop import train
    from gantron_tpu.utils.loading import load_generator
    from gantron_tpu.utils.logging import MetricLogger

    corpus_root = os.path.join(args.output, f"corpus{args.seed}"
                               if args.seed else "corpus")
    os.makedirs(corpus_root, exist_ok=True)
    wav_dir, train_list, val_list, bits = build_factorial_corpus(
        corpus_root, n_utts=args.n_utts, seed=args.seed)

    hp = HParams()
    hp.add_params(small_model_params(args.iterations))
    hp.add_params(dict(
        use_noise=True, noise_size=32, use_labels=False,
        seed=5321 + args.seed,
        training_files=[train_list], validation_files=[val_list],
    ))
    hp.add_params(VARIANTS[args.variant])
    if args.hparams:
        hp.add_params_string(args.hparams)

    out = os.path.join(args.output, args.variant
                       + (f"_s{args.seed}" if args.seed else ""))
    if args.analyze_only:
        iteration, train_seconds = None, None
    else:
        logger = MetricLogger(out, run_name=args.variant)
        t0 = time.time()
        state, iteration = train(out, None, False, hp, wav_dir, logger=logger)
        train_seconds = round(time.time() - t0, 1)

    final_val = final_validation(
        os.path.join(out, f"{args.variant}.metrics.jsonl"))

    ch_a = band_channels(hp, *MODEBAND_SCORE)
    ch_b = band_channels(hp, TEXBAND_SCORE)
    anchors_a = compute_real_anchors(
        train_list, wav_dir, {n: ab[0] for n, ab in bits.items()}, hp,
        channels=ch_a)
    anchors_b = compute_real_anchors(
        train_list, wav_dir, {n: ab[1] for n, ab in bits.items()}, hp,
        channels=ch_b)

    ckpt_path = CheckpointManager(out).latest()
    if iteration is None:
        iteration = int(os.path.basename(ckpt_path)
                        .split("iter=")[1].split("_")[0])
    model, variables = load_generator(ckpt_path, hp)
    seq = np.asarray(
        text_to_sequence(STUDY_TEXT, ["basic_cleaners"]), np.int32)[None]

    infer = jax.jit(lambda v, text, style, kd, kn: model.apply(
        v, text, style, None, None, hp.max_decoder_steps,
        method=model.infer, rngs={"dropout": kd, "noise": kn}))

    def band_levels(mels, lens):
        """Per-sample (level_a, level_b) of a decoded batch."""
        out = np.zeros((mels.shape[0], 2))
        for i in range(mels.shape[0]):
            m = mels[i, :, : max(int(lens[i]), 2)]
            out[i] = (hiband_level(m, ch_a), hiband_level(m, ch_b))
        return out

    # --- SCALING: random-style (N styles) x (M dropout) grid scored on
    # BOTH bands — per-band binary attribution + 4-way joint attribution.
    # The decode grid is the shared instrument (eval.sampling.
    # attribution_level_grid: same key schedule as mode_attribution.py),
    # scored on both bands from the SAME decodes.
    grid = attribution_level_grid(model, variables, hp, seq,
                                  [ch_a, ch_b], n_styles=args.n_styles,
                                  n_dropout=args.n_dropout, seed=args.seed)
    levels_a, levels_b = grid[:, :, 0], grid[:, :, 1]
    attribution_a = attribution_grid_stats(levels_a, anchors_a["midpoint"])
    attribution_b = attribution_grid_stats(levels_b, anchors_b["midpoint"])
    joint = attribution_grid_stats_multi(
        joint_mode_grid(levels_a, levels_b,
                        anchors_a["midpoint"], anchors_b["midpoint"]), 4)

    # --- COVERAGE + DISENTANGLEMENT: decode every trained code cell with
    # shared nuisance draws (the coded_style serving grid) and score which
    # joint mode each cell commits to and which band each code dim moves.
    code_dims = int(getattr(hp, "style_code_dims", 0) or 0)
    code_levels = int(getattr(hp, "style_code_levels", 0) or 0)
    coverage = binding = None
    if code_dims > 0 and code_levels >= 2:
        S = args.code_draws
        cells = np.stack(np.meshgrid(
            *[np.arange(code_levels)] * code_dims,
            indexing="ij")).reshape(code_dims, -1).T  # (n_cells, code_dims)
        n_cells = cells.shape[0]
        k_nuis, k_run = jax.random.split(jax.random.PRNGKey(77 + args.seed))
        nuis = jax.random.uniform(k_nuis, (S, 1, hp.noise_size))
        style_grid = jnp.tile(nuis, (n_cells, 1, 1))  # cell-major
        grid_vals = (jnp.asarray(cells, jnp.float32) + 0.5) / code_levels
        style_grid = style_grid.at[:, 0, :code_dims].set(
            jnp.repeat(grid_vals, S, axis=0))
        cell_text = jnp.broadcast_to(jnp.asarray(seq),
                                     (n_cells * S, seq.shape[1]))
        cell_out = infer(variables, cell_text, style_grid,
                         jax.random.fold_in(k_run, 0),
                         jax.random.fold_in(k_run, 1))
        lv = band_levels(np.asarray(cell_out[1]),
                         np.asarray(cell_out[4]))  # (n_cells*S, 2)
        cell_levels = lv.reshape(n_cells, S, 2)
        cell_modes = joint_mode_grid(
            cell_levels[..., 0], cell_levels[..., 1],
            anchors_a["midpoint"], anchors_b["midpoint"])
        coverage = code_mode_coverage(cell_modes, 4)
        coverage["code_cells"] = cells.tolist()
        binding = code_binding_stats(cell_levels, cells)

    result = {
        "variant": args.variant,
        "hparams": {k: v for k, v in VARIANTS[args.variant].items()},
        "hparams_override": args.hparams,
        "iterations": iteration,
        "train_seconds": train_seconds,
        "seed": args.seed,
        "final_validation": final_val,
        "anchors_a": anchors_a,
        "anchors_b": anchors_b,
        "attribution_a": attribution_a,
        "attribution_b": attribution_b,
        "attribution_joint": joint,
        "coverage": coverage,
        "binding": binding,
        "n_utts": args.n_utts,
        "analyze_only": args.analyze_only,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out, "factorial_study.json"), "w") as f:
        json.dump(result, f, indent=2)
    brief = dict(result)
    for k in ("anchors_a", "anchors_b"):
        brief.pop(k)
    for k in ("attribution_a", "attribution_b"):
        brief[k] = {kk: vv for kk, vv in result[k].items()
                    if kk not in ("level_grid", "per_style_hi_counts")}
    brief["attribution_joint"] = {
        kk: vv for kk, vv in joint.items()
        if kk not in ("per_style_mode_counts",)}
    print(json.dumps(brief, indent=2))


if __name__ == "__main__":
    main()
