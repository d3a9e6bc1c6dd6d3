"""End-to-end study pipeline test (tiny model, Griffin-Lim vocoder)."""

import json
import os

import numpy as np

from gantron_tpu.eval.study import study_model
from tests.test_eval import _tiny_generator


def test_study_model_end_to_end(tmp_path):
    hp, model, variables = _tiny_generator()
    # Tiny classifier pass: small samples, few epochs.
    metrics = study_model(
        str(tmp_path), model, variables, hp, text="hello world",
        n_groups=2, samples=3, predefined=False, force_emotions=False,
        force_noise=True, waveglow=None, classifier_epochs=2, seed=0)

    assert "generation_error_rate" in metrics
    assert 0.0 <= metrics["generation_error_rate"] <= 1.0
    assert "history" in metrics and len(metrics["history"]) == 2
    # Artifacts: generated mels, vocoded wavs, re-extracted features.
    mel_dir = os.path.join(tmp_path, "GANtronInference")
    wav_dir = os.path.join(tmp_path, "WaveGlowInference")
    assert len([f for f in os.listdir(mel_dir) if f.endswith(".npy")]) == 6
    assert len([f for f in os.listdir(wav_dir) if f.endswith(".wav")]) == 6
    assert len([f for f in os.listdir(wav_dir) if f.endswith(".npy")]) == 6
    # Metrics are JSON-serializable (the CLI dumps them).
    json.dumps(metrics)


def test_synthesizer_tts_from_string(tmp_path):
    from gantron_tpu.tts import Synthesizer

    hp, model, variables = _tiny_generator()
    synth = Synthesizer(model, variables, hp)
    mel, L = synth.infer_mel("hello there")
    assert mel.shape[0] == 80 and mel.shape[1] == L and L >= 1
    wav = synth.tts("hi", griffin_lim_iters=2)
    assert wav.ndim == 1 and len(wav) > 0
    assert np.all(np.isfinite(wav))
