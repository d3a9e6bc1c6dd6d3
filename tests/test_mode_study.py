"""Bimodal (one-to-many) corpus + mode-commitment metrics.

Validates the measurement instrument for the GAN-vs-MSE mode study
(scripts/gan_mode_study.py): the hidden high-band texture must be cleanly
separable in the SAME mel features the model trains on, and the commitment
score must rank mode-committed samples above mean-regressed ones.
"""

import os

import numpy as np

from gantron_tpu.config import HParams
from gantron_tpu.data.dataset import TextMelDataset
from gantron_tpu.data.toy import build_bimodal_corpus
from gantron_tpu.eval.mode_study import (commitment_stats, hiband_channels,
                                         hiband_level, mode_anchor_levels)


def test_bimodal_corpus_modes_separate_in_mel(tmp_path):
    root = str(tmp_path)
    wav_dir, train_list, val_list, modes = build_bimodal_corpus(
        root, n_utts=12, n_train=12)
    assert set(modes.values()) == {0, 1}

    hp = HParams()
    hp.add_params(dict(text_buckets=[12], mel_buckets=[60],
                       training_files=[train_list],
                       validation_files=[val_list]))
    ds = TextMelDataset(hp.training_files, hp, wav_dir)
    channels = hiband_channels(hp)
    assert channels.size >= 8  # 5-8 kHz spans a real share of the 80 mels

    levels = {0: [], 1: []}
    for name, mode in modes.items():
        mel = ds.get_mel(os.path.join(wav_dir, name))
        levels[mode].append(hiband_level(mel, channels))
    anchors = mode_anchor_levels(levels)
    # The two real modes must be far apart relative to their own spread —
    # otherwise the study cannot attribute mean-regression to the loss.
    assert anchors["mode_hi"] - anchors["mode_lo"] > 2.0
    assert anchors["halfgap"] > 3 * max(anchors["spread_lo"],
                                        anchors["spread_hi"])


def test_commitment_score_ranks_committed_above_mean():
    anchors = {"mode_lo": -9.0, "mode_hi": -3.0, "midpoint": -6.0,
               "halfgap": 3.0, "spread_lo": 0.2, "spread_hi": 0.2}
    committed = commitment_stats(
        [-9.1, -2.9, -8.8, -3.2, -9.0, -3.0], anchors)
    blurred = commitment_stats(
        [-6.1, -5.9, -6.3, -5.8, -6.0, -6.2], anchors)
    assert committed["mean_commitment"] > 0.9
    assert blurred["mean_commitment"] < 0.2
    assert committed["frac_near_mode"] == 1.0
    assert blurred["frac_near_mode"] == 0.0
    # A one-to-many generator splits its draws across both modes.
    assert 0.3 <= committed["frac_hi"] <= 0.7


def test_texture_corpus_instrument(tmp_path):
    """The stochastic-texture corpus (per-frame sharpness study) must show a
    LARGE within-utterance high-band spread in the training mel features,
    and a mean-regressed (frame-constant) mel must score near zero — the
    contrast the GAN-vs-MSE texture study measures."""
    from gantron_tpu.data.toy import build_texture_corpus
    from gantron_tpu.eval.mode_study import texture_stats

    root = str(tmp_path)
    wav_dir, train_list, val_list = build_texture_corpus(
        root, n_utts=8, n_train=8)
    hp = HParams()
    hp.add_params(dict(text_buckets=[12], mel_buckets=[60],
                       training_files=[train_list],
                       validation_files=[val_list]))
    ds = TextMelDataset(hp.training_files, hp, wav_dir)
    channels = hiband_channels(hp)

    with open(train_list) as f:
        names = [line.split("|")[0] for line in f if line.strip()]
    real = []
    for name in names:
        mel = np.asarray(ds.get_mel(os.path.join(wav_dir, name)))
        real.append((mel, mel.shape[1]))
    real_stats = texture_stats(real, channels)
    assert real_stats["n"] == len(names)
    assert real_stats["temporal_std"] > 0.35  # i.i.d. per-block amplitude

    # MSE-optimal behavior: the constant conditional mean, frame to frame.
    flat = [(np.tile(mel.mean(axis=1, keepdims=True), (1, mel.shape[1])),
             mel.shape[1]) for mel, _ in real]
    flat_stats = texture_stats(flat, channels)
    assert flat_stats["temporal_std"] < 0.05 * real_stats["temporal_std"]


def test_attribution_grid_stats_separates_latent_from_dropout():
    """The shared grid statistic (mode_attribution.py + composed study)
    must call a latent-driven grid identified (overdispersed per-style
    counts, tiny chi^2 p) and a dropout-driven binomial grid unidentified."""
    from gantron_tpu.eval.mode_study import attribution_grid_stats

    rng = np.random.RandomState(0)
    N, M = 16, 8
    # Latent-driven: each style commits to one mode across all dropout keys.
    style_mode = rng.rand(N) < 0.5
    latent_levels = np.where(style_mode[:, None], -3.0, -9.0) \
        + rng.randn(N, M) * 0.3
    ident = attribution_grid_stats(latent_levels, midpoint=-6.0)
    assert ident["within_noise_consistency"] > 0.95
    assert ident["per_style_chi2_p"] < 0.01
    assert 0.2 < ident["grid_frac_hi"] < 0.8

    # Dropout-driven: every cell an independent coin — binomial null.
    coin_levels = np.where(rng.rand(N, M) < 0.5, -3.0, -9.0) \
        + rng.randn(N, M) * 0.3
    null = attribution_grid_stats(coin_levels, midpoint=-6.0)
    assert null["per_style_chi2_p"] > 0.05
    assert null["within_noise_consistency"] < 0.85

    # Fully collapsed grid: degenerate, never a false identification.
    collapsed = attribution_grid_stats(np.full((N, M), -9.0), midpoint=-6.0)
    assert collapsed["per_style_chi2_p"] == 1.0
    assert collapsed["consistency_chance_floor"] == 1.0


def test_composed_corpus_bands_separate_and_dont_interfere(tmp_path):
    """The composed corpus carries BOTH hidden factors; its instrument is
    sound only if (a) the mode bit separates cleanly on the MODE band,
    (b) the per-frame texture spread is large on the TEXTURE band in BOTH
    modes, and (c) the factors don't leak across bands: the mode bit must
    not move the texture-band level, and per-frame texture must not blur
    the mode separation."""
    from gantron_tpu.data.toy import (MODEBAND_SCORE, TEXBAND_SCORE,
                                      build_composed_corpus)
    from gantron_tpu.eval.mode_study import band_channels, texture_stats

    root = str(tmp_path)
    wav_dir, train_list, val_list, modes = build_composed_corpus(
        root, n_utts=14, n_train=14)
    assert set(modes.values()) == {0, 1}

    hp = HParams()
    hp.add_params(dict(text_buckets=[12], mel_buckets=[60],
                       training_files=[train_list],
                       validation_files=[val_list]))
    ds = TextMelDataset(hp.training_files, hp, wav_dir)
    mode_ch = band_channels(hp, *MODEBAND_SCORE)
    tex_ch = band_channels(hp, TEXBAND_SCORE)
    assert mode_ch.size >= 4 and tex_ch.size >= 8
    assert set(mode_ch).isdisjoint(set(tex_ch))

    mode_levels = {0: [], 1: []}
    tex_levels = {0: [], 1: []}
    tex_mels = {0: [], 1: []}
    for name, mode in modes.items():
        mel = np.asarray(ds.get_mel(os.path.join(wav_dir, name)))
        mode_levels[mode].append(hiband_level(mel, mode_ch))
        tex_levels[mode].append(hiband_level(mel, tex_ch))
        tex_mels[mode].append((mel, mel.shape[1]))

    # (a) mode separation on the mode band, well beyond the within-mode
    # spread (same bar as the bimodal corpus test).
    anchors = mode_anchor_levels(mode_levels)
    assert anchors["mode_hi"] - anchors["mode_lo"] > 2.0
    assert anchors["halfgap"] > 3 * max(anchors["spread_lo"],
                                        anchors["spread_hi"])

    # (b) texture spread present in both modes.
    for mode in (0, 1):
        assert texture_stats(tex_mels[mode],
                             tex_ch)["temporal_std"] > 0.3

    # (c) no cross-band leakage: the mode bit moves the texture band by far
    # less than it moves its own band.
    tex_shift = abs(np.mean(tex_levels[1]) - np.mean(tex_levels[0]))
    assert tex_shift < 0.25 * (anchors["mode_hi"] - anchors["mode_lo"])


def test_factorial_corpus_bits_separate_and_independent(tmp_path):
    """The factorial corpus carries TWO independent hidden bits; the
    scaling-study instrument (scripts/gan_factorial_study.py) is sound only
    if each bit separates cleanly on ITS band, neither bit leaks onto the
    other's band, and all 4 joint modes occur."""
    from gantron_tpu.data.toy import (MODEBAND_SCORE, TEXBAND_SCORE,
                                      build_factorial_corpus)
    from gantron_tpu.eval.mode_study import band_channels

    root = str(tmp_path)
    wav_dir, train_list, val_list, bits = build_factorial_corpus(
        root, n_utts=24, n_train=24)
    assert set(bits.values()) == {(0, 0), (0, 1), (1, 0), (1, 1)}

    hp = HParams()
    hp.add_params(dict(text_buckets=[12], mel_buckets=[60],
                       training_files=[train_list],
                       validation_files=[val_list]))
    ds = TextMelDataset(hp.training_files, hp, wav_dir)
    ch_a = band_channels(hp, *MODEBAND_SCORE)
    ch_b = band_channels(hp, TEXBAND_SCORE)
    assert ch_a.size >= 4 and ch_b.size >= 8
    assert set(ch_a).isdisjoint(set(ch_b))

    lv_a = {0: [], 1: []}   # band-A level keyed by bit A
    lv_b = {0: [], 1: []}   # band-B level keyed by bit B
    leak_a = {0: [], 1: []}  # band-A level keyed by bit B (must not move)
    leak_b = {0: [], 1: []}  # band-B level keyed by bit A
    for name, (a, b) in bits.items():
        mel = np.asarray(ds.get_mel(os.path.join(wav_dir, name)))
        la, lb = hiband_level(mel, ch_a), hiband_level(mel, ch_b)
        lv_a[a].append(la)
        lv_b[b].append(lb)
        leak_a[b].append(la)
        leak_b[a].append(lb)

    for lv in (lv_a, lv_b):
        anchors = mode_anchor_levels(lv)
        assert anchors["mode_hi"] - anchors["mode_lo"] > 2.0
        assert anchors["halfgap"] > 3 * max(anchors["spread_lo"],
                                            anchors["spread_hi"])
    # Independence: the OTHER bit moves each band by far less than its own.
    gap_a = np.mean(lv_a[1]) - np.mean(lv_a[0])
    gap_b = np.mean(lv_b[1]) - np.mean(lv_b[0])
    assert abs(np.mean(leak_a[1]) - np.mean(leak_a[0])) < 0.25 * gap_a
    assert abs(np.mean(leak_b[1]) - np.mean(leak_b[0])) < 0.25 * gap_b


def test_attribution_grid_stats_multi_separates_latent_from_dropout():
    """The 4-way joint attribution must call a latent-driven grid
    identified, a per-cell coin grid unidentified, and a collapsed grid
    degenerate — same contract as the binary statistic."""
    from gantron_tpu.eval.mode_study import (attribution_grid_stats_multi,
                                             joint_mode_grid)

    rng = np.random.RandomState(0)
    N, M = 16, 8
    # Latent-driven: each style commits to one of 4 joint modes.
    style_mode = rng.randint(0, 4, N)
    a = np.where((style_mode // 2)[:, None] == 1, -3.0, -9.0) \
        + rng.randn(N, M) * 0.3
    b = np.where((style_mode % 2)[:, None] == 1, -2.0, -8.0) \
        + rng.randn(N, M) * 0.3
    modes = joint_mode_grid(a, b, mid_a=-6.0, mid_b=-5.0)
    assert set(np.unique(modes)) <= {0, 1, 2, 3}
    ident = attribution_grid_stats_multi(modes, 4)
    assert ident["within_noise_consistency"] > 0.95
    assert ident["per_style_chi2_p"] < 0.01
    assert ident["modes_present"] == 4
    assert sum(ident["styles_majority_per_mode"]) == N

    # Dropout-driven: every cell an independent 4-way draw.
    null = attribution_grid_stats_multi(rng.randint(0, 4, (N, M)), 4)
    assert null["per_style_chi2_p"] > 0.05
    assert null["within_noise_consistency"] < 0.8

    # Fully collapsed: one mode everywhere — degenerate, never identified.
    collapsed = attribution_grid_stats_multi(np.full((N, M), 2), 4)
    assert collapsed["per_style_chi2_p"] == 1.0
    assert collapsed["consistency_chance_floor"] == 1.0
    assert collapsed["modes_present"] == 1


def test_code_binding_and_coverage_stats():
    """Disentanglement + coverage on synthetic code-cell decode grids: a
    factorized code (dim0 -> band A, dim1 -> band B) scores modular,
    injective, full-coverage; an entangled/collapsed one does not."""
    from gantron_tpu.eval.mode_study import (code_binding_stats,
                                             code_mode_coverage,
                                             joint_mode_grid)

    rng = np.random.RandomState(1)
    cells = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    S = 8
    # Disentangled: dim0 moves band A only, dim1 moves band B only.
    a = np.where(cells[:, 0:1] == 1, -3.0, -9.0) + rng.randn(4, S) * 0.2
    b = np.where(cells[:, 1:2] == 1, -2.0, -8.0) + rng.randn(4, S) * 0.2
    levels = np.stack([a, b], axis=-1)  # (4, S, 2)
    binding = code_binding_stats(levels, cells)
    assert binding["assignment"] == [0, 1]
    assert binding["bands_bound"] == 2
    assert binding["modularity"] > 0.9
    modes = joint_mode_grid(a, b, mid_a=-6.0, mid_b=-5.0)
    cov = code_mode_coverage(modes, 4)
    assert cov["coverage"] == 1.0
    assert cov["cell_consistency"] > 0.95
    assert cov["cell_majority_modes"] == [0, 1, 2, 3]

    # Entangled: BOTH dims move band A equally, band B never moves ->
    # non-injective assignment and only 2 of 4 modes reachable.
    a2 = np.where(cells.sum(axis=1, keepdims=True) >= 1, -3.0, -9.0) \
        + rng.randn(4, S) * 0.2
    b2 = np.full((4, S), -8.0) + rng.randn(4, S) * 0.2
    binding2 = code_binding_stats(np.stack([a2, b2], axis=-1), cells)
    assert binding2["bands_bound"] == 1
    cov2 = code_mode_coverage(
        joint_mode_grid(a2, b2, mid_a=-6.0, mid_b=-5.0), 4)
    assert cov2["coverage"] == 0.5

    # Collapsed: code ignored entirely -> one mode, zero-ish binding.
    a3 = np.full((4, S), -9.0) + rng.randn(4, S) * 0.2
    cov3 = code_mode_coverage(
        joint_mode_grid(a3, b2, mid_a=-6.0, mid_b=-5.0), 4)
    assert cov3["coverage"] == 0.25


def test_leveled_corpus_instrument(tmp_path):
    """The continuous-factor corpus is a valid instrument only if the
    REAL utterances' measured band level is monotone (and ~linear, by the
    log-uniform amplitude map) in the hidden level u across its whole
    range — through the same mel extraction the model trains on."""
    from gantron_tpu.data.toy import MODEBAND_SCORE, build_leveled_corpus
    from gantron_tpu.eval.mode_study import band_channels, compute_real_levels

    root = str(tmp_path)
    wav_dir, train_list, val_list, levels = build_leveled_corpus(
        root, n_utts=28, n_train=28)
    assert all(0.0 <= u <= 1.0 for u in levels.values())
    # U(0,1) draws over 28 utts should span most of the range.
    assert max(levels.values()) - min(levels.values()) > 0.7

    hp = HParams()
    hp.add_params(dict(text_buckets=[12], mel_buckets=[60],
                       training_files=[train_list],
                       validation_files=[val_list]))
    curve = compute_real_levels(train_list, wav_dir, levels, hp,
                                channels=band_channels(hp, *MODEBAND_SCORE))
    assert curve["n"] == 28
    assert curve["spearman"] > 0.9
    assert curve["spearman_p"] < 1e-6
    # The 18 dB amplitude sweep must survive into the log-mel band level
    # as a usable dynamic range (log-units of the dB-scaled mel).
    assert curve["p95"] - curve["p5"] > 1.5
    # ~Linear, not floor-compressed: Pearson close to the Spearman.
    pear = np.corrcoef(curve["u"], curve["band_level"])[0, 1]
    assert pear > 0.9


def test_bileveled_corpus_instrument(tmp_path):
    """The two-continuous-factor corpus (the vector study's instrument,
    scripts/gan_vector_study.py) is sound only if EACH hidden level is
    monotone on ITS band through the trained-on mel extraction AND the
    cross-band leakage is small — the continuous analog of the factorial
    corpus's independence check."""
    from scipy import stats as sstats

    from gantron_tpu.data.toy import (MODEBAND_SCORE, TEXBAND_SCORE,
                                      build_bileveled_corpus)
    from gantron_tpu.eval.mode_study import band_channels, compute_real_levels

    root = str(tmp_path)
    wav_dir, train_list, val_list, levels = build_bileveled_corpus(
        root, n_utts=40, n_train=40)
    ua = [uv[0] for uv in levels.values()]
    ub = [uv[1] for uv in levels.values()]
    assert all(0.0 <= u <= 1.0 for u in ua + ub)
    # Independent draws: the two levels must not be correlated by
    # construction.
    assert abs(sstats.spearmanr(ua, ub).statistic) < 0.5

    hp = HParams()
    hp.add_params(dict(text_buckets=[12], mel_buckets=[60],
                       training_files=[train_list],
                       validation_files=[val_list]))
    chans = [band_channels(hp, *MODEBAND_SCORE),
             band_channels(hp, TEXBAND_SCORE)]
    curves = [compute_real_levels(
        train_list, wav_dir, {n: uv[b] for n, uv in levels.items()}, hp,
        channels=chans[b]) for b in range(2)]
    for curve in curves:
        assert curve["spearman"] > 0.9
        assert curve["spearman_p"] < 1e-6
        assert curve["p95"] - curve["p5"] > 1.5
    # Cross-band leakage: band b's level must NOT track the OTHER factor.
    for b in range(2):
        cross = compute_real_levels(
            train_list, wav_dir,
            {n: uv[1 - b] for n, uv in levels.items()}, hp,
            channels=chans[b])
        assert abs(cross["spearman"]) < 0.4


def test_continuous_control_stats():
    """A monotone code->level transfer scores high Spearman / coverage /
    control ratio with a significant permutation p; a code-ignoring
    (flat) transfer scores ~0 with an insignificant p."""
    from gantron_tpu.eval.mode_study import continuous_control_stats

    rng = np.random.RandomState(0)
    codes = np.linspace(0.05, 0.95, 10)
    S = 8
    monotone = (-9.0 + 4.0 * codes)[:, None] + rng.randn(10, S) * 0.15
    st = continuous_control_stats(codes, monotone, real_p5=-9.0,
                                  real_p95=-5.0, n_perm=2000)
    assert st["spearman"] > 0.9
    assert st["perm_p"] < 0.01
    assert st["monotonicity"] == 1.0
    assert st["range_coverage"] > 0.8
    assert st["control_ratio"] > 3.0

    flat = np.full((10, S), -7.0) + rng.randn(10, S) * 0.3
    st2 = continuous_control_stats(codes, flat, real_p5=-9.0,
                                   real_p95=-5.0, n_perm=2000)
    assert abs(st2["spearman"]) < 0.35
    assert st2["perm_p"] > 0.05
    assert st2["range_coverage"] < 0.3
