"""End-to-end training-loop smoke test (BASELINE config 1 is CPU-runnable)."""

import glob
import json
import os

import numpy as np
import pytest

from gantron_tpu.config import HParams
from gantron_tpu.train.loop import train
from gantron_tpu.utils.logging import MetricLogger


def tiny_hp(**over):
    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=48, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=32,
        postnet_n_convolutions=3, noise_size=8, discriminator_dim=32,
        max_decoder_steps=24, use_noise=True, use_labels=False,
        scan_unroll=1, mesh_shape=[1],  # 1-device mesh: CI hosts may have 1 core
        batch_size=4, iterations=10, iters_per_checkpoint=10,
        disc_warmp_up=9, attn_steps=5, validation_audio=False,
        text_buckets=[16], mel_buckets=[40],
    ))
    for k, v in over.items():
        hp.add_param(k, v)
    return hp


def test_training_loop_runs_and_checkpoints(tmp_path):
    hp = tiny_hp(validation_sample_diversity=3)
    out_dir = str(tmp_path / "run")
    logger = MetricLogger(out_dir, run_name="test")
    state, iteration = train(out_dir, None, False, hp, "synthetic",
                             logger=logger)
    assert iteration == 10
    # Both G and D steps happened: step counter advanced through both phases.
    assert int(np.asarray(state.step)) == 10

    # A checkpoint was written with the reference naming scheme.
    ckpts = glob.glob(os.path.join(out_dir, "iter=*_val-loss=*.ckpt"))
    assert len(ckpts) >= 1

    # Metrics JSONL has both generator and discriminator entries.
    metrics_file = os.path.join(out_dir, "test.metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_file)]
    keys = set(k for r in records for k in r)
    assert "Generator loss" in keys
    assert "Discriminator loss" in keys
    assert "Validation mel loss" in keys
    # The free-running mode-collapse detector logged a positive spread
    # (always-on prenet dropout alone guarantees > 0 across draws).
    divs = [r["Sample diversity"] for r in records if "Sample diversity" in r]
    assert divs and all(np.isfinite(d) and d > 0 for d in divs)


def test_update_rescue_scale_controller():
    """Pure controller law: escalate below the floor (capped), attenuate
    above the ceiling (floored at 1/cap), decay back toward 1 from either
    side in the healthy band, identity when disabled."""
    from gantron_tpu.train.loop import update_rescue_scale

    hp = tiny_hp(diversity_rescue_floor=0.5, diversity_rescue_gain=2.0,
                 diversity_rescue_max=8.0)
    s = 1.0
    for expected in (2.0, 4.0, 8.0, 8.0):  # escalates, then caps
        s = update_rescue_scale(s, 0.1, hp)
        assert s == expected
    s = update_rescue_scale(s, 0.9, hp)  # healthy -> decay
    assert s == 4.0
    for _ in range(5):
        s = update_rescue_scale(s, 0.9, hp)
    assert s == 1.0  # never below 1 without a ceiling trip

    # Ceiling side: the measured collapse signature is the ratio
    # INFLATING (off-manifold code effect) — attenuate.
    hp2 = tiny_hp(diversity_rescue_ceiling=8.3, diversity_rescue_gain=2.0,
                  diversity_rescue_max=8.0)
    s = 1.0
    for expected in (0.5, 0.25, 0.125, 0.125, 0.125):  # floors at 1/cap
        s = update_rescue_scale(s, 15.0, hp2)
        assert s == expected
    s = update_rescue_scale(s, 3.0, hp2)  # healthy -> decay back up
    assert s == 0.25
    for _ in range(5):
        s = update_rescue_scale(s, 3.0, hp2)
    assert s == 1.0  # never above 1 without a floor trip

    # Two-sided config: both bounds live simultaneously.
    hp3 = tiny_hp(diversity_rescue_floor=1.5, diversity_rescue_ceiling=8.3,
                  diversity_rescue_gain=2.0, diversity_rescue_max=8.0)
    assert update_rescue_scale(1.0, 1.0, hp3) == 2.0
    assert update_rescue_scale(1.0, 15.0, hp3) == 0.5
    assert update_rescue_scale(2.0, 3.0, hp3) == 1.0

    hp_off = tiny_hp()  # both bounds unset -> always 1.0
    assert update_rescue_scale(5.0, 0.0, hp_off) == 1.0


def test_update_factor_scales_controller():
    """Per-dim controller law (config.py factor_rescue_floor): a dim whose
    separation ratio sits below the floor escalates ITS weight (capped);
    healthy dims decay toward 1 — independently per dim."""
    from gantron_tpu.train.loop import update_factor_scales

    hp = tiny_hp(factor_rescue_floor=2.18, diversity_rescue_gain=2.0,
                 diversity_rescue_max=8.0)
    s = [1.0, 1.0]
    s = update_factor_scales(s, [0.5, 3.5], hp)  # dim0 sick, dim1 healthy
    assert s == [2.0, 1.0]
    s = update_factor_scales(s, [0.5, 3.5], hp)
    assert s == [4.0, 1.0]
    for _ in range(3):
        s = update_factor_scales(s, [0.5, 3.5], hp)
    assert s == [8.0, 1.0]  # caps at diversity_rescue_max
    s = update_factor_scales(s, [5.0, 3.5], hp)  # dim0 recovered -> decay
    assert s == [4.0, 1.0]
    for _ in range(5):
        s = update_factor_scales(s, [5.0, 3.5], hp)
    assert s == [1.0, 1.0]  # never below 1 (weights, not penalties)

    hp_off = tiny_hp()
    assert update_factor_scales([4.0, 2.0], [0.0, 0.0], hp_off) == [1.0, 1.0]


def test_update_factor_scales_warmup_gate():
    """Before factor_rescue_warmup iterations the controller is unarmed:
    weights reset to 1.0 regardless of the sensor (separation only exists
    after identification FORMS — an unarmed-from-iter-0 controller pins
    every dim at max gain through the formative phase, measured to harm:
    docs/TRAINING_EVIDENCE.md 'Factor-aware rescue, first form')."""
    from gantron_tpu.train.loop import update_factor_scales

    hp = tiny_hp(factor_rescue_floor=2.18, factor_rescue_warmup=2000,
                 diversity_rescue_gain=2.0, diversity_rescue_max=8.0)
    # Sick sensor before warmup: held at 1.0 (even resets escalated state).
    assert update_factor_scales([1.0, 1.0], [0.5, 0.5], hp, 0) == [1.0, 1.0]
    assert update_factor_scales([4.0, 2.0], [0.5, 0.5], hp,
                                1999) == [1.0, 1.0]
    # At/after warmup: the per-dim law applies.
    assert update_factor_scales([1.0, 1.0], [0.5, 3.5], hp,
                                2000) == [2.0, 1.0]
    # iteration=None (direct controller calls, no loop context): ungated.
    assert update_factor_scales([1.0, 1.0], [0.5, 3.5], hp) == [2.0, 1.0]


@pytest.mark.parametrize("actuator", ["redraw", "recon"])
def test_factor_rescue_escalates_and_logs(tmp_path, actuator):
    """With an impossibly high per-dim floor every validation trips the
    factor controller on every dim: the logged per-dim scales escalate by
    the gain while the per-dim separation sensor stays finite. Both
    actuators share the controller/escalation/logging; only the actuation
    differs (recon — the shipped default — needs the recon term it
    weights)."""
    hp = tiny_hp(validation_sample_diversity=3,
                 factor_rescue_floor=1e9, factor_rescue_warmup=0,
                 factor_rescue_actuator=actuator,
                 style_reconstruction_weight=(
                     1.0 if actuator == "recon" else 0.0),
                 diversity_rescue_gain=3.0,
                 diversity_rescue_max=4.5,
                 adversarial_rollouts=True, diversity_weight=0.5,
                 diversity_cap=0.9, diversity_subset_redraw=True,
                 style_code_dims=2, style_code_levels=2,
                 iterations=20, iters_per_checkpoint=5)
    out_dir = str(tmp_path / "run")
    logger = MetricLogger(out_dir, run_name="test")
    train(out_dir, None, False, hp, "synthetic", logger=logger)
    records = [json.loads(l)
               for l in open(os.path.join(out_dir, "test.metrics.jsonl"))]
    for d in (0, 1):
        scales = [r[f"Factor rescue scale dim{d}"] for r in records
                  if f"Factor rescue scale dim{d}" in r]
        assert scales == [3.0, 4.5, 4.5, 4.5]
        seps = [r[f"Identification separation dim{d}"] for r in records
                if f"Identification separation dim{d}" in r]
        assert len(seps) == len(scales)
        assert all(np.isfinite(s) and s >= 0 for s in seps)


def test_factor_rescue_guards(tmp_path):
    import pytest

    # Multi-dim sensor needs a multi-dim code.
    hp = tiny_hp(factor_rescue_floor=2.18, validation_sample_diversity=3,
                 adversarial_rollouts=True, diversity_weight=0.5,
                 diversity_subset_redraw=True)
    with pytest.raises(ValueError, match="style_code_dims"):
        train(str(tmp_path / "a"), None, False, hp, "synthetic",
              logger=MetricLogger(None, quiet=True))
    # The redraw actuator acts through the weighted SUBSET redraw.
    hp = tiny_hp(factor_rescue_floor=2.18, validation_sample_diversity=3,
                 factor_rescue_actuator="redraw",
                 adversarial_rollouts=True, diversity_weight=0.5,
                 style_code_dims=2, style_code_levels=2)
    with pytest.raises(ValueError, match="diversity_subset_redraw"):
        train(str(tmp_path / "b"), None, False, hp, "synthetic",
              logger=MetricLogger(None, quiet=True))
    # The recon actuator (the shipped default) weights the per-dim
    # style-reconstruction errors — armed without that term is a no-op.
    hp = tiny_hp(factor_rescue_floor=2.18, validation_sample_diversity=3,
                 adversarial_rollouts=True, diversity_weight=0.5,
                 diversity_subset_redraw=True,
                 style_code_dims=2, style_code_levels=2)
    with pytest.raises(ValueError, match="style_reconstruction_weight"):
        train(str(tmp_path / "c"), None, False, hp, "synthetic",
              logger=MetricLogger(None, quiet=True))


def test_rescue_requires_probe_and_terms(tmp_path):
    import pytest

    # No detector configured.
    hp = tiny_hp(diversity_rescue_floor=0.5)
    with pytest.raises(ValueError, match="validation_sample_diversity"):
        train(str(tmp_path / "a"), None, False, hp, "synthetic",
              logger=MetricLogger(None, quiet=True))
    # Detector on, but nothing for the rescue scale to multiply.
    hp = tiny_hp(diversity_rescue_floor=0.5, validation_sample_diversity=3)
    with pytest.raises(ValueError, match="diversity_weight"):
        train(str(tmp_path / "b"), None, False, hp, "synthetic",
              logger=MetricLogger(None, quiet=True))


def test_rescue_escalates_and_logs(tmp_path):
    """With an impossibly high floor every validation trips the controller:
    the logged identification_rescue_scale must escalate by the gain."""
    hp = tiny_hp(validation_sample_diversity=3,
                 diversity_rescue_floor=1e9, diversity_rescue_gain=3.0,
                 diversity_rescue_max=4.5,
                 adversarial_rollouts=True, diversity_weight=0.5,
                 diversity_cap=0.9,
                 iterations=20, iters_per_checkpoint=5)
    out_dir = str(tmp_path / "run")
    logger = MetricLogger(out_dir, run_name="test")
    train(out_dir, None, False, hp, "synthetic", logger=logger)
    records = [json.loads(l)
               for l in open(os.path.join(out_dir, "test.metrics.jsonl"))]
    scales = [r["Identification rescue scale"] for r in records
              if "Identification rescue scale" in r]
    # 4 validations: 3.0, then capped at 4.5.
    assert scales == [3.0, 4.5, 4.5, 4.5]
    # The sensor itself is logged: the latent-separation ratio (finite,
    # positive — the scale-free statistic the floor is calibrated on).
    seps = [r["Identification separation"] for r in records
            if "Identification separation" in r]
    assert len(seps) == len(scales)
    assert all(np.isfinite(s) and s > 0 for s in seps)


def test_resume_from_checkpoint(tmp_path):
    hp = tiny_hp(iterations=6, iters_per_checkpoint=6)
    out_dir = str(tmp_path / "run")
    train(out_dir, None, False, hp, "synthetic",
          logger=MetricLogger(out_dir, run_name="a", quiet=True))
    ckpts = glob.glob(os.path.join(out_dir, "iter=*_val-loss=*.ckpt"))
    assert ckpts

    hp2 = tiny_hp(iterations=9, iters_per_checkpoint=100)
    state, iteration = train(out_dir, ckpts[0], False, hp2, "synthetic",
                             logger=MetricLogger(out_dir, run_name="b",
                                                 quiet=True))
    assert iteration == 9  # resumed at 6, ran steps 6-8


def test_loop_linear_discriminator_and_vesus(tmp_path):
    """Exercise the linear-discriminator and VESUS-conditioning paths
    through the real training loop."""
    hp = tiny_hp(iterations=8, iters_per_checkpoint=100,
                 disc_warmp_up=7, discriminator_type="linear",
                 vesus_path="/synthetic/vesus", use_labels=True)
    out_dir = str(tmp_path / "run")
    state, iteration = train(out_dir, None, False, hp, "synthetic",
                             logger=MetricLogger(out_dir, run_name="lin",
                                                 quiet=True))
    assert iteration == 8
    assert int(np.asarray(state.step)) == 8


def test_auto_resume_and_saved_lr(tmp_path):
    """A rerun with the same command auto-resumes from the newest checkpoint
    (preemption recovery), and use_saved_learning_rate restores the LR stored
    with the checkpoint (reference train.py:266-269) — including off-schedule
    values — instead of reconstructing the halving schedule."""
    hp = tiny_hp(iterations=6, iters_per_checkpoint=6)
    out_dir = str(tmp_path / "run")
    train(out_dir, None, False, hp, "synthetic",
          logger=MetricLogger(out_dir, run_name="a", quiet=True))
    ckpts = glob.glob(os.path.join(out_dir, "iter=*_val-loss=*.ckpt"))
    assert ckpts

    # Simulate an off-schedule LR adjustment recorded at save time.
    meta_path = ckpts[0] + ".meta.json"
    meta = json.load(open(meta_path))
    meta["g_lr"] = 3.21e-4
    json.dump(meta, open(meta_path, "w"))

    hp2 = tiny_hp(iterations=8, iters_per_checkpoint=100,
                  use_saved_learning_rate=True)
    # No checkpoint path given: must auto-resume from latest().
    state, iteration = train(out_dir, None, False, hp2, "synthetic",
                             logger=MetricLogger(out_dir, run_name="b",
                                                 quiet=True))
    assert iteration == 8  # resumed at 6, not from scratch

    records = [json.loads(l) for l in
               open(os.path.join(out_dir, "b.metrics.jsonl"))]
    lrs = [r["Generator learning rate"] for r in records
           if "Generator learning rate" in r]
    assert lrs and abs(lrs[0] - 3.21e-4) < 1e-12, lrs


def test_validation_audio_griffin_lim(tmp_path):
    """validation_audio=True writes vocoded wavs into media/ (reference
    logger.py:27-54; Griffin-Lim fallback when no WaveGlow is given)."""
    hp = tiny_hp(iterations=2, iters_per_checkpoint=2,
                 validation_audio=True,
                 filter_length=256, win_length=256, hop_length=64)
    out_dir = str(tmp_path / "run")
    train(out_dir, None, False, hp, "synthetic",
          logger=MetricLogger(out_dir, run_name="v", quiet=True))
    wavs = glob.glob(os.path.join(out_dir, "media", "*.wav"))
    assert len(wavs) >= 1
    from gantron_tpu.data.wav import load_wav
    wav = load_wav(wavs[0], hp.sampling_rate)
    assert wav.size > 0 and np.isfinite(wav).all()
