"""Configuration system for GANtron-TPU.

Mirrors the reference ``HParams`` schema field-for-field (reference:
hparams.py:7-113 and hparams_classifier.py:7-52) so that CLI overrides written
for the reference (``--hparams k=v,k=v``) keep working, while being a typed
dataclass rather than a bag of attributes.

Notable differences from the reference (all intentional, TPU-driven):
  * CUDA/NCCL knobs (``cudnn_enabled``, ``dist_backend``, ``dist_url``, ...)
    are accepted for CLI compatibility but are inert: JAX/XLA manages devices
    and collectives through the mesh (see ``gantron_tpu.parallel``).
  * ``fp16_run`` maps to bfloat16 compute (no loss scaling needed on TPU).
  * New TPU-specific fields are grouped at the bottom (bucketing, mesh shape).
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional


def _split_top_level(s: str) -> list:
    """Split ``k=v,k=v`` on commas NOT inside brackets, so list-valued
    overrides parse: ``mel_buckets=[240,480],batch_size=8`` is two params
    (a naive ``split(",")`` crashed on every multi-element list)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        elif ch == "," and depth == 0:
            if s[start:i]:
                parts.append(s[start:i])
            start = i + 1
    if s[start:]:
        parts.append(s[start:])
    return parts


def _parse_value(value: str) -> Any:
    """Parse a CLI override value the same way the reference does.

    The reference (hparams.py:118-128) keeps values containing ``/`` as raw
    strings (paths) and otherwise tries ``ast.literal_eval`` with a string
    fallback.
    """
    if "/" in value:
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


@dataclass
class HParams:
    """Training/model hyper-parameters (schema parity: reference hparams.py)."""

    version: float = 0.6

    # -- Experiment ---------------------------------------------------------
    epochs: int = 100
    iterations: Optional[int] = None  # if set, stop after this many steps
    iters_per_checkpoint: int = 5000
    # Length-aware batching: pool this many batches, sort the pool by mel
    # length, emit in shuffled order (0/1 disables). Cuts bucket padding.
    sort_pool_batches: int = 8
    # Render vocoded validation audio at checkpoints (reference
    # logger.py:27-54; WaveGlow when --waveglow_path given, else Griffin-Lim).
    validation_audio: bool = True
    # Free-running mode-collapse detector: decode this many open-loop samples
    # of one validation text at each validation (distinct noise draws) and log
    # their mean pairwise masked L1 spread as "Sample diversity". Teacher-
    # forced val mel conditions on real history, so it is structurally blind
    # to mode collapse — a GAN can converge in val mel while sampling one
    # mode (measured: docs/TRAINING_EVIDENCE.md round-4 keep-best probe).
    # 0 disables (default: costs one extra compiled decode per validation).
    validation_sample_diversity: int = 0
    seed: int = 1234
    dynamic_loss_scaling: bool = True  # inert on TPU (bf16 needs no scaling)
    fp16_run: bool = False  # on TPU: bfloat16 compute
    distributed_run: bool = False
    dist_backend: str = "nccl"  # inert: XLA collectives over ICI/DCN
    dist_url: str = "tcp://localhost:54321"  # inert
    cudnn_enabled: bool = True  # inert
    cudnn_benchmark: bool = False  # inert
    ignore_layers: List[str] = field(default_factory=lambda: [
        "decoder.attention_rnn.weight_ih",
        "decoder.attention_layer.memory_layer.linear_layer.weight",
        "decoder.decoder_rnn.weight_ih",
        "decoder.linear_projection.linear_layer.weight",
        "decoder.gate_layer.linear_layer.weight",
    ])
    attn_steps: int = 5000
    reduce_lr_steps_every: float = 5e4
    vesus_path: Optional[str] = None
    speakers_embedding: int = 64
    use_labels: bool = True
    use_noise: bool = False
    use_intended_labels: bool = True

    # -- Data ---------------------------------------------------------------
    load_mel_from_disk: bool = False
    training_files: List[str] = field(default_factory=lambda: [
        "filelists/ljs_audio_text_train_filelist.txt",
        "filelists/vesus_train.txt",
    ])
    validation_files: List[str] = field(default_factory=lambda: [
        "filelists/ljs_audio_text_val_filelist.txt",
        "filelists/vesus_val.txt",
    ])
    text_cleaners: List[str] = field(default_factory=lambda: ["english_cleaners"])
    n_labels: int = 5

    # -- Audio --------------------------------------------------------------
    max_wav_value: float = 32768.0
    sampling_rate: int = 22050
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_ftt: int = 1024  # (sic) name kept for override compatibility
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    # -- Model --------------------------------------------------------------
    n_symbols: int = 0  # filled in __post_init__ from the symbol table
    symbols_embedding_dim: int = 512

    encoder_kernel_size: int = 5
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512

    # K mel frames per decoder recurrence step — Kx fewer sequential scan
    # steps, the dominant training/decode cost on TPU. The reference declares
    # this knob but only supports 1 (hparams.py:71); here K in {1, 2, 4, ...}
    # works end to end (decoder regroups K frames per scan step, collate pads
    # T_out to a multiple, losses/attention-guide are K-aware). Measured
    # decision (round 4, full evidence pipeline head-to-head —
    # docs/TRAINING_EVIDENCE.md "K=2 decision evidence"): the DEFAULT stays 1
    # for training; K=2 is the documented SERVING-LATENCY option (decode RTF
    # 0.0084 vs 0.0114, 1.72x fewer scan steps). Controllability and
    # attention quality are K-invariant-or-better (study acc 0.90, GER
    # 0.00, kmeans 1.00 at both; K=2 alignment monotonicity 1.000 and
    # focus 0.710 vs 0.683 once measured with step-level slicing); K=2's
    # one measured quality cost is val mel +11% at equal iterations, and
    # its throughput case does not hold on
    # short-utterance shapes where the scan no longer dominates. Flip
    # per-deployment behind the evidence pipeline's quality gate, not
    # silently for every user (the reference's checkpoints/recipes also
    # assume K=1).
    n_frames_per_step: int = 1
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    max_decoder_steps: int = 500
    gate_threshold: float = 0.5
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1

    attention_rnn_dim: int = 1024
    attention_dim: int = 128

    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31

    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5

    # -- GAN ----------------------------------------------------------------
    discriminator_window: int = 20
    discriminator_dim: int = 512
    g_freq: int = 2
    d_freq: int = 1
    clipping_value: float = 0.001
    gradient_penalty_lambda: float = 0
    noise_size: int = 512
    disc_warmp_up: int = 500  # (sic) name kept for override compatibility
    discriminator_type: str = "conv"
    encoder_inputs: bool = False

    # -- Optimization -------------------------------------------------------
    use_saved_learning_rate: bool = False
    g_learning_rate: float = 0.001
    d_learning_rate: float = 0.0007
    weight_decay: float = 1e-6
    grad_clip_thresh: float = 1.0
    batch_size: int = 32
    mask_padding: bool = True

    # -- TPU-native additions (not in the reference) ------------------------
    # Text/mel bucket boundaries: each batch is padded up to the smallest
    # bucket that fits, keeping jit shapes static with a bounded compile count.
    text_buckets: List[int] = field(default_factory=lambda: [48, 96, 160, 200])
    mel_buckets: List[int] = field(default_factory=lambda: [240, 480, 720, 900])
    mesh_shape: Optional[List[int]] = None  # default: 1-D mesh over all chips
    compute_dtype: str = "float32"  # "bfloat16" when fp16_run is set
    # Decoder/encoder lax.scan unroll factor: 8 is ~36% faster per train step
    # on v5e (fewer loop iterations, cross-step fusion) at the cost of longer
    # compiles. Tests use 1-2 for fast compilation.
    scan_unroll: int = 8
    # Serving lever: store the decoder's four large recurrence matrices as
    # per-channel int8 inside the inference scan. The sequential decode floor
    # is HBM traffic on exactly these weights, so this halves it; decode
    # output deviation is bounded by tests/test_quant.py. Off by default.
    quantized_inference: bool = False
    # Defer the decoder scan's big weight gradients (LSTM matrices, attention
    # query projection) to post-scan batched matmuls instead of per-step
    # accumulator updates inside the backward scan — ~28% of the G-step
    # backward is that accumulator's HBM read-modify-write traffic. Exact
    # (same grads as plain autodiff; verified by tests/test_deferred_dw.py).
    deferred_dw: bool = True
    # Free-running adversarial rollouts: each G step additionally decodes the
    # batch OPEN-LOOP (no teacher forcing; fresh noise; the same differentiable
    # lax.scan serving uses) and adds the discriminator's score on that rollout
    # to the generator loss; the D step then trains against rollout fakes
    # instead of teacher-forced ones. The reference's GAN only ever scores
    # teacher-forced outputs (train.py:371-383), where the forced history — not
    # the latent — carries the mode, so its noise input can go unused
    # (measured: docs/TRAINING_EVIDENCE.md mode study). Rollouts put the
    # adversarial pressure on the distribution actually sampled at inference.
    # Infeasible in the reference (its per-frame Python decode loop makes
    # differentiating a free run prohibitively slow); a scan makes it one more
    # compiled graph. Off by default (parity).
    adversarial_rollouts: bool = False
    # InfoGAN-style latent identification (builds on adversarial_rollouts):
    # a small StyleEncoder head predicts the injected noise/style vector back
    # from the FREE-RUNNING rollout mel, and the prediction error joins the G
    # loss with this weight. Adversarial pressure alone matches the sampled
    # DISTRIBUTION but never asks the latent to carry the mode (measured:
    # docs/TRAINING_EVIDENCE.md — the reference's own noise input,
    # model.py:184-191/273-279, stays functionally dead under its
    # teacher-forced scheme, train.py:371-383, and rollouts alone do not
    # identify it either); maximizing latent->output mutual information does.
    # 0 disables (parity). Requires use_noise and adversarial_rollouts.
    style_reconstruction_weight: float = 0.0
    # Diversity-sensitive regularizer (Yang et al., ICLR 2019: "Diversity-
    # Sensitive Conditional GANs"): each G step decodes the rollout TWICE
    # with two independent style draws under a SHARED dropout key, and the
    # generator is rewarded for output distance per unit style distance,
    # -mean(min(|mel1-mel2|_1 / |z1-z2|_1, diversity_tau)). Why it exists:
    # the Q head alone sits at a cold-start saddle — when the generator is
    # style-invariant (which teacher-forced MSE actively encourages, the
    # style being pure noise w.r.t. the forced target), the Q head is flat
    # and passes ZERO gradient back, so identification never starts
    # (measured: a 3000-iter style_reconstruction_weight=10 run whose recon
    # loss sat at the uniform prior's 1/12 floor throughout —
    # docs/TRAINING_EVIDENCE.md round 4). This term's gradient is nonzero
    # exactly at that style-invariant point: it directly pushes
    # d(mel)/d(style) != 0, the Q head then organizes WHAT the style
    # carries, and D keeps the varied outputs on the data manifold.
    # 0 disables (parity). Requires use_noise and adversarial_rollouts.
    diversity_weight: float = 0.0
    # Clamp on the per-sample distance ratio above (DSGAN's tau): bounds the
    # incentive so diversity cannot grow unboundedly at the data term's
    # expense. Set it AT the natural cross-mode output distance (not above):
    # the reward then saturates exactly when the code flips real modes, and
    # extra never-seen spread earns nothing (measured: tau=10 / weight=1 on
    # the round-4 study corpus let raw-L1 diversity swamp fidelity — val mel
    # 1.77 vs 0.20 — while identification still never started). Units:
    # mean-|log-mel| distance per mean-|uniform| style distance; cross-mode
    # pairs on that corpus sit at ~3.
    diversity_tau: float = 10.0
    # Saturating OUTPUT-UNIT form of the diversity reward (> 0 replaces the
    # ratio form above): mean(min(|mel1-mel2|_1, diversity_cap))/diversity_cap
    # — in [0, 1], gradient identically zero once the two decodes differ by
    # the cap, in mel-L1 units, regardless of how far apart the two code
    # draws were. Why the ratio form is not enough: its clamp is per unit
    # CODE distance, so for large code redraws the reward keeps growing
    # until d_out = tau * d_z — far past a mode flip — and the generator
    # "watermarks": it shifts rollouts off-manifold where code-dependent
    # swings are unconstrained by data (measured on 2 chip seeds, tau=3
    # w=0.5: every sample off-manifold, frac_near_mode 0.0, val mel 0.87 /
    # 0.56 vs ~0.25 baseline — docs/TRAINING_EVIDENCE.md round 4). Set the
    # cap BETWEEN the within-mode jitter distance and the cross-mode flip
    # distance (measured on the bimodal study corpus: 0.28 vs 1.05, same
    # text): a flip then earns the full reward and anything beyond earns
    # nothing, so the cheapest saturating solution is flipping real modes.
    # The cap is a CORPUS CALIBRATION, not a universal constant — for a
    # CONTINUOUS factor set it AT the natural cross-extreme output
    # distance (leveled corpus: full-range same-text distance 0.435 vs
    # within-level jitter 0.27 -> cap 0.45). Measured consequence of
    # leaving the bimodal 0.9 in place there: the reward never saturates
    # on-manifold and the knob's range coverage floats on a
    # seed-dependent equilibrium (0.23-1.64 of the real range); the
    # calibrated 0.45 lands all 3 seeds in [0.85, 1.30] with equal or
    # better fidelity (docs/TRAINING_EVIDENCE.md "Continuous control").
    diversity_cap: float = 0.0
    # Redraw a random NONEMPTY SUBSET of the code dims for the diversity
    # pair instead of shifting every dim (train/step.py redraw_code). With
    # the default all-dims form and 2-level multi-dim codes, every pair is
    # the all-dims flip — single-dim flips are never rewarded, so nothing
    # asks each code dim to SEPARATELY control the output (the per-dim
    # contrast a factorized code needs on a multi-factor corpus, e.g.
    # data.toy.build_factorial_corpus). No effect for style_code_dims <= 1.
    diversity_subset_redraw: bool = False
    # InfoGAN code/nuisance split of the injected style vector: the Q head
    # reconstructs (and the diversity term redraws) only the FIRST
    # style_code_dims dims; the rest stay nuisance noise. Classic InfoGAN
    # structure — identification pressure over all noise_size=512 dims is
    # ~1 bit spread over the whole vector (invisible next to the data
    # terms), over a 2-4 dim code it is material. 0 = no split (the whole
    # vector is the code). Serving controls generation by sweeping the code
    # dims of the style passed to infer/Synthesizer.
    style_code_dims: int = 0
    # Discretize the code: draw each code dim from {(k+0.5)/L for k<L}
    # instead of continuous U[0,1) (L = style_code_levels; 0 = continuous).
    # Classic InfoGAN uses CATEGORICAL codes for discrete generative factors,
    # and the round-4 measurements show why that matters: with a continuous
    # code, the Q head's MSE can only beat the uniform prior's floor if the
    # mel carries CONTINUOUS code information — but a corpus whose latent
    # factor is binary (which mode) has only a 1-bit on-manifold channel, so
    # continuous identification pressure structurally demands an off-manifold
    # continuous carrier: the measured "watermark" (all samples pushed past
    # the hi mode; infogan_code 2/2 seeds, infogan_sat 2/3, infogan_warm —
    # docs/TRAINING_EVIDENCE.md round 4). A 2-level code is exactly
    # satisfiable by flipping real modes: recon MSE -> 0 with zero residual
    # pressure off the manifold. The Q head is unchanged (sigmoid output,
    # MSE against the grid values); the diversity redraw flips to a
    # DIFFERENT level (never the same one, so every pair carries contrast).
    # At inference the code enters the network as a raw float like any
    # style value; decodes commit to the nearest trained level's basin.
    style_code_levels: int = 0
    # Code-modularity (disentanglement) penalty for multi-dim codes: the
    # factorial campaign measured that per-dim output CONTRAST (subset
    # redraw) + reconstruction identify a product latent space but bind it
    # ENTANGLEDLY — code axes rotated against the corpus's factor axes
    # (joint chi^2 ~0 p's at coverage 0.5-0.75 and modularity ~0.2,
    # docs/TRAINING_EVIDENCE.md "Factorial scaling study") — and nothing
    # in the objective prefers axis-aligned binding. When > 0 the
    # diversity stage decodes the rollout THREE times — base code, dim-i
    # flipped, dim-j flipped (i != j drawn per sample) — rewards each
    # single-dim pair's saturating contrast separately (each dim owes the
    # full diversity_cap on its own, a strictly stronger per-dim demand
    # than the random subset), and penalizes the |cosine| between the two
    # per-dim output deltas: dims controlling disjoint output structure
    # (e.g. disjoint mel bands) score 0, dims driving the same channel
    # score ~1. This is the two-level finite-difference analogue of the
    # Hessian Penalty's off-diagonal interaction term (Peebles et al.,
    # ECCV 2020: minimizing off-diagonal d2G/dzi dzj disentangles); with
    # discrete codes the per-dim first differences ARE the axes, so
    # orthogonality of the deltas is the modular-binding surrogate.
    # 0 disables. Requires diversity_weight > 0, diversity_cap > 0, and
    # style_code_dims >= 2. Cost: one extra rollout decode per G step
    # (3 instead of the diversity pair's 2).
    code_modularity_weight: float = 0.0
    # Additivity (mixed-second-difference) form of the modular-binding
    # pressure: extends the modularity triple with a FOURTH decode — the
    # joint flip of dims i and j (same per-dim offsets as the single
    # flips) — and penalizes the masked mean-L1 of
    # G(z_ij) - G(z_i) - G(z_j) + G(z): the discrete off-diagonal Hessian
    # itself rather than the |cos| surrogate. Why it exists next to the
    # cosine form: in a high-dimensional mel space near-orthogonality is
    # FREE for noise-like deltas (two random vectors are almost
    # orthogonal), so the |cos| penalty can be satisfied without any
    # binding structure — whereas additivity demands the per-dim effects
    # be deterministic and COMPOSE (the joint flip must land where both
    # single flips predict), which noise deltas and entangled same-band
    # effects both violate, and which directly pressures every joint mode
    # to be reachable (coverage). A dead dim satisfies it trivially —
    # deadness remains the per-dim diversity reward's job. In mel-L1
    # units (same scale as diversity_cap). The joint decode also joins
    # the saturating diversity reward (3 pairs averaged), so the all-dims
    # contrast the subset redraw sampled is owed here too. 0 disables.
    # Same requirements as code_modularity_weight (either or both may be
    # on; both share the i/j draw and the 3 base decodes). Cost: one
    # extra rollout decode per G step on top of the triple.
    code_additivity_weight: float = 0.0
    # REWARD-shaped binding (the measured lesson of both penalty forms
    # above — docs/TRAINING_EVIDENCE.md "Binding penalties": every
    # penalty on the STRUCTURE of a code effect is minimized by a zero
    # code effect, so penalties accelerate collapse). When True, the
    # modularity-triple decodes run (base + dim-i flip + dim-j flip) and
    # each single-dim flip's saturating diversity contrast is SCALED by
    # the sine between the two per-dim output deltas: entangled
    # (parallel, same-band) effects earn ~nothing, a dead dim earns
    # ~nothing through its own contrast, and only live orthogonal
    # (disjoint-structure) effects collect the full reward — there is no
    # term a code-ignoring generator can satisfy. A dead SIBLING does not
    # suppress a live dim (cos -> 0 -> sin -> 1 at the denominator
    # floor). Composes with the factor-aware rescue (the weighted i-draw)
    # and with either penalty (the sin scaling and the penalties share
    # the triple decodes). Requires diversity_weight > 0,
    # diversity_cap > 0, style_code_dims >= 2. Cost: one extra rollout
    # decode per G step (3 instead of the diversity pair's 2).
    code_orthogonal_reward: bool = False
    # Identification warm-up: hold the InfoGAN terms (style_reconstruction_
    # weight AND diversity_weight) at ZERO for this many iterations, then
    # switch them on at full strength. Why: switching identification on at
    # init races D — the Q/diversity pressure finds its cheapest carrier
    # before D has anchored the data manifold, and on 2 of 3 chip seeds that
    # carrier was an off-manifold "watermark" even with the saturating cap
    # (round-4 infogan_sat: seed 0 identified on-manifold, chi2 p<1e-6;
    # seeds 1-2 drifted, frac_near_mode 0.4/0.0 — docs/TRAINING_EVIDENCE.md).
    # A pure-rollout warm start is measured stable (3/3 seeds frac_near_mode
    # 1.0), so identification then starts from a generator that already
    # samples real modes and D already rejects off-manifold output. The
    # schedule is host-side (a traced 0/1 scale, like attn_steps): no
    # recompile at the boundary. 0 disables (identification on from step 0).
    identification_warmup: int = 0
    # Collapse-rescue controller: the round-4 campaign's one failure mode is
    # a seed collapsing to one MODE — the code stops selecting modes
    # (attribution chi^2 = 0) while teacher-forced val mel AND free-running
    # spread both stay healthy (both measured blind to it: keep-best probe +
    # the rescue calibration, docs/TRAINING_EVIDENCE.md). The live sensor
    # is the scale-free LATENT-SEPARATION RATIO
    # (eval.sampling.code_separation_ratio): decode a (code levels x
    # nuisance draws) grid of one validation text per validation and take
    # between-code / within-code output distance. Calibration on 11 real
    # checkpoints (scripts/calibrate_rescue_floor.py) measured that under
    # identification pressure collapse presents as the ratio INFLATING
    # (the Q loss keeps the code decodable, so its effect migrates to an
    # off-manifold channel with outsized L1: collapsed 9.1-18.2 vs healthy
    # 2.1-7.6), never as the naive ratio~1 latent-death signature — that
    # only shows in non-identification configs (nogan 0.94). Hence TWO
    # bounds on the ratio, each 0-disabled:
    # - below ``diversity_rescue_floor`` (cold-start saddle, code
    #   output-invisible): the identification/diversity scale (train.loop
    #   ident_scale — a traced scalar, so no recompile) is multiplied by
    #   ``diversity_rescue_gain`` (capped at ``diversity_rescue_max``);
    # - above ``diversity_rescue_ceiling`` (off-manifold inflation / mode
    #   collapse): divided by the gain (floored at 1/max) — attenuating
    #   the pressure that feeds the inflation;
    # - healthy band: decay back toward 1 from either side.
    # Calibrated ceiling for the composed-study config: 8.3 (geometric mid
    # of the bands). Requires the probe (validation_sample_diversity >= 2)
    # and the identification terms (adversarial_rollouts +
    # diversity_weight/style_reconstruction_weight).
    diversity_rescue_floor: float = 0.0
    diversity_rescue_ceiling: float = 0.0
    diversity_rescue_gain: float = 2.0
    diversity_rescue_max: float = 8.0
    # Factor-aware rescue (multi-dim codes only): the diagonal separation
    # ratio above is measurably BLIND to factor collapse — on a
    # multi-factor corpus the code keeps a visible output effect while one
    # code dim dies, so the diagonal never trips (measured on all 6
    # factorial checkpoints: it sat at 25.9 on a half-collapsed arm and
    # 2.0 on a dead one — docs/TRAINING_EVIDENCE.md "Factor-aware collapse
    # sensor"). The factor-aware sensor is the PER-DIM separation ratio
    # (eval.sampling.latent_separation(dim=d): sweep one code dim with the
    # other dims and nuisance shared), whose MIN separates
    # identified/partial/collapsed 6/6 (calibrated floor 2.18, geometric
    # mid of 3.47 healthy vs 1.37 best-sick). When a dim's ratio falls
    # below this floor the controller escalates a PER-DIM redraw weight
    # (train/loop.py update_factor_scales; gain/cap shared with
    # diversity_rescue_gain/_max) and passes the normalized weights into
    # the g-step, where the subset redraw (diversity_subset_redraw) draws
    # its guaranteed dim from them and joins other dims with probability
    # 0.5 * w_d / max(w) — concentrating the diversity contrast owed by
    # single-dim pairs onto the collapsing factor, without touching the
    # global ident_scale the diagonal controller owns (the two cannot
    # conflict: one is a scalar on the loss terms, the other a
    # distribution over code dims). Uniform weights reproduce the plain
    # subset redraw exactly. 0 disables. Requires style_code_dims >= 2,
    # diversity_subset_redraw=True, and the validation probe
    # (validation_sample_diversity >= 2).
    factor_rescue_floor: float = 0.0
    # Iterations before the factor-aware controller may escalate (weights
    # held at 1.0 = the plain subset redraw until then). Measured need
    # (docs/TRAINING_EVIDENCE.md "Factor-aware rescue, first form"): the
    # floor is calibrated on END-OF-TRAINING checkpoints, but every run —
    # including ones that go on to identify — starts below it (separation
    # needs identification to have FORMED), so an unarmed-from-iter-0
    # controller pins all dims at max gain through the formative phase
    # and measurably harms (1/3 joint-identified vs the plain subset
    # redraw's 3/3 on the factorial corpus, seeds 0-2, chip). The
    # controller is a RECOVERY device for post-formation factor collapse
    # (measured an attractor that more training never leaves), not a
    # bootstrapping device.
    factor_rescue_warmup: int = 2000
    # WHERE the factor-aware rescue's per-dim weights act
    # (factor_rescue_floor). "redraw": bias the subset-redraw/probe draws
    # toward the weak dim — measured HARMFUL on the factorial corpus (the
    # diversity reward is zero-sum across dims, so concentrating contrast
    # on the weak dim STARVES the healthy dim's maintenance reward; 600
    # escalated iters destroyed an identified band on seed 0 —
    # docs/TRAINING_EVIDENCE.md). "recon": weight the per-dim
    # style-reconstruction (Q-head) errors instead — identification
    # pressure is NOT zero-sum across dims, so escalating the weak dim
    # leaves the healthy dim's entire objective untouched. Both actuators
    # are bit-identical to the baseline at uniform weights. "recon"
    # requires style_reconstruction_weight > 0. Default "recon": measured
    # strictly less destructive on both seeds where the controller acted
    # (redraw destroyed an identified band, chi2 108.9->0.0; recon kept
    # coverage and best-in-arm fidelity at chi2 46.7 —
    # docs/TRAINING_EVIDENCE.md "Recon actuator measured").
    factor_rescue_actuator: str = "recon"

    def __post_init__(self):
        if self.n_symbols == 0:
            from gantron_tpu.text.symbols import symbols

            self.n_symbols = len(symbols)
        if self.fp16_run and self.compute_dtype == "float32":
            self.compute_dtype = "bfloat16"

    # -- Reference-compatible override API ---------------------------------
    # (reference hparams.py:118-149)
    def add_param(self, param: str, value: Any) -> None:
        fld = getattr(type(self), "__dataclass_fields__", {}).get(param)
        if (fld is not None and isinstance(value, str)
                and "List" in str(fld.type)):
            # Path-valued overrides of list fields reach here as raw strings
            # (the reference parser — mirrored in _parse_value — never
            # literal_evals a value containing "/", hparams.py:121, which
            # made ``training_files=[/a.txt]`` impossible to set from the
            # CLI there). Accept ``files=[/a.txt,/b.txt]`` and bare
            # ``files=/a.txt`` for fields the schema declares as lists.
            inner = (value[1:-1] if value[:1] == "[" and value[-1:] == "]"
                     else value)
            value = [p.strip().strip("'\"") for p in inner.split(",")
                     if p.strip()]
        object.__setattr__(self, param, value)

    def add_params_string(self, hparams_string: str) -> None:
        for param in _split_top_level(hparams_string):
            key, value = param.split("=", 1)
            self.add_param(key, _parse_value(value))

    def add_params(self, params) -> None:
        if isinstance(params, str) and "=" in params:
            self.add_params_string(params)
            return
        if isinstance(params, argparse.Namespace):
            params = vars(params)
        hparams_string = None
        for param, value in params.items():
            if param == "hparams":
                hparams_string = value
            elif value is not None:
                self.add_param(param, value)
        if hparams_string is not None:
            # --hparams has the highest priority (reference hparams.py:147-149)
            self.add_params_string(hparams_string)

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}

    @classmethod
    def create(cls, hparams_string: Optional[str] = None) -> "HParams":
        hp = cls()
        if hparams_string:
            hp.add_params_string(hparams_string)
        return hp


@dataclass
class ClassifierHParams:
    """Emotion-classifier hyper-parameters (reference hparams_classifier.py)."""

    epochs: int = 100
    precision: int = 32
    use_labels: str = "intended"  # 'one' | 'intended' | 'multi'
    model_version: str = "0.6.1"

    training_files: List[str] = field(default_factory=lambda: [
        "filelists/vesus_train.txt",
        "filelists/cremad_train.txt",
        "filelists/ravdess_train.txt",
    ])
    validation_files: List[str] = field(default_factory=lambda: [
        "filelists/vesus_val.txt",
        "filelists/cremad_val.txt",
        "filelists/ravdess_val.txt",
    ])
    test_files: List[str] = field(default_factory=lambda: [
        "filelists/vesus_test.txt",
        "filelists/cremad_test.txt",
        "filelists/ravdess_test.txt",
    ])
    n_emotions: int = 5

    sampling_rate: int = 22050
    n_ftt: int = 1024
    hop_length: int = 256
    n_mel_channels: int = 80
    mel_offset: int = 0

    linear_model: bool = True
    model_size: int = 256
    n_frames: int = 80

    lr: float = 0.001
    weight_decay: float = 1e-6
    batch_size: int = 8
    max_noise: int = 5

    add_param = HParams.add_param
    add_params_string = HParams.add_params_string
    add_params = HParams.add_params
    as_dict = HParams.as_dict

    @classmethod
    def create(cls, hparams_string: Optional[str] = None) -> "ClassifierHParams":
        hp = cls()
        if hparams_string:
            hp.add_params_string(hparams_string)
        return hp
