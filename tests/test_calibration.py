"""Knob-calibration tests (eval/calibration.py): PAVA, monotone
fit/inverse, sign detection, serialization, and the measure_knob sweep
protocol against a real (random-init) generator."""

import json

import numpy as np

import jax

from gantron_tpu.config import HParams
from gantron_tpu.eval.calibration import KnobCalibration, measure_knob, pava
from gantron_tpu.models import Tacotron2


def test_pava_pools_violators():
    y = np.array([1.0, 3.0, 2.0, 4.0])
    out = pava(y)
    # The (3, 2) violation pools to its mean; ends untouched.
    assert np.allclose(out, [1.0, 2.5, 2.5, 4.0])
    assert np.all(np.diff(out) >= 0)


def test_pava_identity_on_sorted():
    y = np.array([0.0, 0.5, 1.5, 2.0])
    assert np.allclose(pava(y), y)


def test_fit_increasing_and_roundtrip():
    codes = np.linspace(0.05, 0.95, 11)
    rng = np.random.RandomState(0)
    levels = -2.5 + 1.2 * codes + rng.randn(11) * 0.02
    cal = KnobCalibration.fit(codes, levels)
    assert cal.sign == 1
    assert np.all(np.diff(cal.level_curve) >= 0)
    # Inverse round-trips through strictly-increasing regions.
    for c in [0.15, 0.5, 0.85]:
        lv = cal.level_for_code(c)
        assert abs(cal.code_for_level(lv) - c) < 0.06
    # Out-of-range levels clamp to the endpoint codes.
    lo, hi = cal.level_range
    assert cal.code_for_level(lo - 1.0) == cal.code_values[0]
    assert cal.code_for_level(hi + 1.0) == cal.code_values[-1]


def test_fit_detects_decreasing_knob():
    # The campaign's s1: same knob, mirrored (rho -0.996).
    codes = np.linspace(0.0, 1.0, 9)
    levels = 0.5 - 2.0 * codes + np.sin(codes * 7) * 0.01
    cal = KnobCalibration.fit(codes, levels)
    assert cal.sign == -1
    assert np.all(np.diff(cal.level_curve) <= 0)
    lv = cal.level_for_code(0.25)
    assert abs(cal.code_for_level(lv) - 0.25) < 0.07
    # Higher code -> lower level.
    assert cal.level_for_code(0.9) < cal.level_for_code(0.1)


def test_fit_accepts_draw_matrix_and_coverage():
    codes = np.linspace(0.0, 1.0, 6)
    draws = (codes[:, None] * 1.0 + np.random.RandomState(1)
             .randn(6, 8) * 0.01)
    cal = KnobCalibration.fit(codes, draws)
    assert cal.coverage(0.0, 2.0) == (
        (cal.level_range[1] - cal.level_range[0]) / 2.0)
    assert 0.4 < cal.coverage(0.0, 2.0) < 0.6


def test_json_roundtrip():
    codes = np.linspace(0.05, 0.95, 7)
    cal = KnobCalibration.fit(codes, codes * 2.0, code_dim=3)
    cal2 = KnobCalibration.from_json(cal.to_json())
    assert cal2.code_dim == 3 and cal2.sign == cal.sign
    assert np.allclose(cal2.code_values, cal.code_values)
    assert np.allclose(cal2.level_curve, cal.level_curve)
    json.loads(cal.to_json())  # valid JSON document


def test_style_for_level_pins_code_dim():
    codes = np.linspace(0.0, 1.0, 5)
    cal = KnobCalibration.fit(codes, codes * 3.0, code_dim=2)
    style = cal.style_for_level(1.5, jax.random.PRNGKey(0), noise_size=8)
    assert style.shape == (1, 1, 8)
    assert abs(float(style[0, 0, 2]) - 0.5) < 0.05  # level 1.5 -> code 0.5
    # nuisance dims stay in the uniform box
    assert float(style.min()) >= 0.0 and float(style.max()) <= 1.0


def test_measure_knob_protocol():
    """Sweep protocol on a real (random-init) generator: shapes, shared
    nuisance draws, and fit interop. Random weights give a flat knob —
    the protocol must still run and fit cleanly."""
    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=48, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=32,
        postnet_n_convolutions=3, noise_size=8, use_noise=True,
        use_labels=False, max_decoder_steps=12, scan_unroll=2))
    model = Tacotron2(hp)
    ids = np.array([[3, 5, 7, 9, 11]], np.int32)
    mels = np.zeros((1, hp.n_mel_channels, 8), np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        ids, np.array([5], np.int32), mels, np.zeros((1,), np.int32),
        np.zeros((1, 5), np.float32), np.array([8], np.int32), train=False)

    codes, levels = measure_knob(
        model, variables, hp, ids[0],
        score_fn=lambda mel: float(mel.mean()),
        code_values=np.linspace(0.1, 0.9, 3), n_draws=2, seed=0)
    assert codes.shape == (3,) and levels.shape == (3, 2)
    assert np.isfinite(levels).all()
    cal = KnobCalibration.fit(codes, levels)
    assert np.isfinite(cal.level_for_code(0.5))


def test_synthesizer_level_serving():
    """Serving integration: load_calibration (both the bare curve and the
    calibrate_knob.py wrapper document) + infer_mel(level=...)."""
    from gantron_tpu.tts import Synthesizer

    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=2, attention_rnn_dim=48, decoder_rnn_dim=48,
        prenet_dim=16, attention_dim=24, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=32,
        postnet_n_convolutions=3, noise_size=8, use_noise=True,
        use_labels=False, max_decoder_steps=12, scan_unroll=2))
    model = Tacotron2(hp)
    ids = np.array([[3, 5, 7, 9, 11]], np.int32)
    mels = np.zeros((1, hp.n_mel_channels, 8), np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        ids, np.array([5], np.int32), mels, np.zeros((1,), np.int32),
        np.zeros((1, 5), np.float32), np.array([8], np.int32), train=False)
    synth = Synthesizer(model, variables, hp)

    codes = np.linspace(0.0, 1.0, 5)
    cal = KnobCalibration.fit(codes, codes * 2.0 - 3.0)
    # Bare curve JSON.
    synth.load_calibration(cal.to_json())
    mel, L = synth.infer_mel(ids[0], level=-2.0)
    assert mel.shape[0] == hp.n_mel_channels and L >= 1
    # Wrapper document (what scripts/calibrate_knob.py writes).
    wrapped = json.dumps({"variant": "cont_warm",
                          "calibration": json.loads(cal.to_json())})
    synth.load_calibration(wrapped)
    style = synth.style_for_level(-2.0)
    assert abs(float(style[0, 0, 0]) - 0.5) < 0.05  # level -2 -> code 0.5
    # level + style together is an error.
    try:
        synth.infer_mel(ids[0], style=style, level=-2.0)
        assert False, "expected ValueError"
    except ValueError:
        pass
