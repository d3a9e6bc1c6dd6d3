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


def _synthetic_sweeps(M, c, code_values, S=4, noise=0.01, seed=0):
    """Per-dim measure_knob-shaped sweeps from a known linear system."""
    rng = np.random.RandomState(seed)
    n = len(c)
    sweeps = []
    for d in range(n):
        levels = np.empty((len(code_values), S, n))
        for i, cv in enumerate(code_values):
            for s in range(S):
                code = rng.uniform(0.05, 0.95, n)  # nuisance on other dims
                code[d] = cv
                levels[i, s] = c + M @ (code - 0.5) + rng.randn(n) * noise
        sweeps.append((code_values, levels))
    return sweeps


def test_vector_calibration_fit_recovers_system():
    from gantron_tpu.eval.calibration import VectorCalibration

    M = np.array([[1.8, 0.7], [-0.9, 1.1]])  # rotated, full-rank
    c = np.array([-6.0, -4.5])
    codes = np.linspace(0.05, 0.95, 11)
    cal = VectorCalibration.fit(_synthetic_sweeps(M, c, codes))
    # Slopes recover despite the other dim riding in the nuisance draws.
    assert np.allclose(cal.matrix, M, atol=0.15)
    assert np.allclose(cal.intercept, c, atol=0.1)
    assert cal.condition_number < 10


def test_vector_calibration_inverts_rotation():
    from gantron_tpu.eval.calibration import VectorCalibration

    M = np.array([[1.8, 0.7], [-0.9, 1.1]])
    c = np.array([-6.0, -4.5])
    cal = VectorCalibration(M, c)
    # A reachable joint target inverts exactly and stays in the box.
    target = c + np.array([0.3, -0.2])
    code, in_box = cal.code_for_levels(target)
    assert in_box
    assert np.allclose(cal.levels_for_code(code), target, atol=1e-9)
    # An unreachable target reports the clip instead of silently lying.
    far = c + np.array([5.0, -5.0])
    code, in_box = cal.code_for_levels(far)
    assert not in_box
    assert np.all((code >= 0.05) & (code <= 0.95))


def test_vector_calibration_json_roundtrip():
    from gantron_tpu.eval.calibration import VectorCalibration

    cal = VectorCalibration([[1.0, 0.2], [0.1, -0.8]], [-5.0, -7.0])
    cal2 = VectorCalibration.from_json(cal.to_json())
    assert np.allclose(cal2.matrix, cal.matrix)
    assert np.allclose(cal2.intercept, cal.intercept)
    assert cal2.code_box == cal.code_box


def test_measure_knob_vector_score_fn_keeps_band_axis():
    """A vector score_fn must come back as (n_codes, n_draws, n_bands),
    feeding VectorCalibration.fit directly."""
    hp = HParams()
    hp.add_params(dict(
        symbols_embedding_dim=32, encoder_embedding_dim=32,
        encoder_n_convolutions=1, attention_rnn_dim=32, decoder_rnn_dim=32,
        prenet_dim=16, attention_dim=16, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=32,
        postnet_n_convolutions=2, max_decoder_steps=12, noise_size=8,
        use_noise=True, use_labels=False, n_frames_per_step=1))
    model = Tacotron2(hp)
    ids = np.array([[5, 6, 7]], np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        ids, None, None, None, 4, method=model.infer)
    codes, levels = measure_knob(
        model, variables, hp, ids,
        score_fn=lambda mel: np.array([mel.mean(), mel.std()]),
        code_values=np.linspace(0.1, 0.9, 3), n_draws=2, max_steps=8)
    assert levels.shape == (3, 2, 2)
