"""MetricLogger wandb branch, exercised against a stub wandb module.

The reference logs scalars, media, and checkpoint files to W&B
(logger.py:10-61, train.py:237-238, 455-465); wandb is not installed here,
so these tests install a recording fake in ``sys.modules`` and assert every
wandb-facing branch calls into it with the reference's names/semantics.
"""

import sys
import types

import numpy as np

from gantron_tpu.utils.logging import MetricLogger


class _FakeImage:
    def __init__(self, data):
        self.data = data


class _FakeAudio:
    def __init__(self, data, sample_rate=None):
        self.data = data
        self.sample_rate = sample_rate


def _install_fake_wandb(monkeypatch):
    fake = types.ModuleType("wandb")
    fake.calls = {"init": [], "log": [], "save": []}
    fake.Image = _FakeImage
    fake.Audio = _FakeAudio
    fake.init = lambda **kw: fake.calls["init"].append(kw)
    fake.log = lambda record, step=None, commit=False: \
        fake.calls["log"].append((record, step, commit))
    fake.save = lambda path: fake.calls["save"].append(path)
    monkeypatch.setitem(sys.modules, "wandb", fake)
    return fake


def test_wandb_scalars_media_and_save(tmp_path, monkeypatch):
    fake = _install_fake_wandb(monkeypatch)
    logger = MetricLogger(str(tmp_path), run_name="stub", use_wandb=True,
                          wandb_project="Compare", config={"batch_size": 2})

    assert fake.calls["init"] == [{
        "project": "Compare", "name": "stub", "config": {"batch_size": 2}}]

    # Scalars: prettified reference key names (logger.py:10-14).
    logger.log_values(3, mel_loss=1.5, generator_loss=2.0)
    record, step, commit = fake.calls["log"][-1]
    assert step == 3 and commit is False
    assert record == {"Mel loss": 1.5, "Generator loss": 2.0}

    # Validation media: images become wandb.Image, audio wandb.Audio with
    # the sample rate (logger.py:27-61).
    wav = np.zeros(128, np.float32)
    logger.log_media(7, images={"alignment_0": "a.png"},
                     audios={"audio_0": wav}, sample_rate=22050)
    record, step, _ = fake.calls["log"][-1]
    assert step == 7
    assert isinstance(record["alignment_0"], _FakeImage)
    assert record["alignment_0"].data == "a.png"
    assert isinstance(record["audio_0"], _FakeAudio)
    assert record["audio_0"].sample_rate == 22050

    # Checkpoint upload (train.py:455-465 wandb.save).
    logger.save_file("/tmp/ckpt-1")
    assert fake.calls["save"] == ["/tmp/ckpt-1"]

    # JSONL file written alongside (the always-on path).
    logger.close()
    assert (tmp_path / "stub.metrics.jsonl").read_text().strip()


def test_wandb_absent_is_silent(tmp_path, monkeypatch):
    """use_wandb=True without wandb installed degrades to JSONL-only."""
    monkeypatch.setitem(sys.modules, "wandb", None)

    # ``import wandb`` with None in sys.modules raises ImportError.
    logger = MetricLogger(str(tmp_path), run_name="none", use_wandb=True)
    assert logger._wandb is None
    logger.log_values(1, mel_loss=0.5)
    logger.log_media(1, images={"x": "y.png"})
    logger.save_file("/tmp/nothing")
    logger.close()
    assert (tmp_path / "none.metrics.jsonl").read_text().strip()
