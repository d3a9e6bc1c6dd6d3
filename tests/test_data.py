"""Data pipeline tests: WAV IO, filelist parsing, bucketing/collate."""

import os

import numpy as np

from gantron_tpu.config import HParams
from gantron_tpu.data import (DataLoader, SyntheticDataset, TextMelDataset,
                              collate, load_vesus, load_wav, pick_bucket,
                              read_wav, write_wav)


def test_wav_roundtrip(tmp_path):
    t = np.arange(22050) / 22050.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, sig, 22050)
    back, rate = read_wav(path)
    assert rate == 22050
    np.testing.assert_allclose(back, sig, atol=1e-4)


def test_wav_resample(tmp_path):
    t = np.arange(44100) / 44100.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "b.wav")
    write_wav(path, sig, 44100)
    out = load_wav(path, 22050)
    assert abs(len(out) - 22050) <= 2
    # Frequency is preserved: count zero crossings ~ 2*440.
    zc = int(np.sum(np.abs(np.diff(np.sign(out[:22050])))) // 2)
    assert 800 < zc < 960


def test_pick_bucket():
    assert pick_bucket(10, [48, 96]) == 48
    assert pick_bucket(48, [48, 96]) == 48
    assert pick_bucket(49, [48, 96]) == 96
    assert pick_bucket(1000, [48, 96]) == 96  # callers clamp afterwards


def test_load_vesus_modes(tmp_path):
    f = tmp_path / "vesus.txt"
    f.write_text("Audio/Angry/1.wav|hello there|7|0.1,0.6,0.1,0.1,0.1\n"
                 "Audio/Sad/2.wav|bye|3|0.2,0.1,0.1,0.5,0.1\n")
    paths, speakers, emotions = load_vesus(str(f), "/root/", use_labels="one")
    assert speakers == [7, 3]
    assert emotions[0].tolist() == [0, 1, 0, 0, 0]
    assert paths[0][0] == "/root/Audio/Angry/1.wav"

    _, _, emo_int = load_vesus(str(f), "/root/", use_labels="intended")
    assert emo_int[0] == [0, 1, 0, 0, 0]
    assert emo_int[1] == [0, 0, 0, 1, 0]

    _, _, emo_multi = load_vesus(str(f), "/root/", use_labels="multi")
    assert emo_multi[0] == [0.1, 0.6, 0.1, 0.1, 0.1]


def test_collate_bucketing_and_gate():
    hp = HParams()
    hp.add_params(dict(text_buckets=[16, 32], mel_buckets=[40, 80]))
    rng = np.random.RandomState(0)
    samples = [
        (rng.randint(1, 100, 9).astype(np.int32),
         rng.randn(80, 33).astype(np.float32), 1, np.zeros(5, np.float32)),
        (rng.randint(1, 100, 14).astype(np.int32),
         rng.randn(80, 25).astype(np.float32), 2, np.ones(5, np.float32)),
    ]
    b = collate(samples, hp)
    assert b.text.shape == (2, 16)
    assert b.mels.shape[2] == 40  # bucket 40, already a multiple of 20
    assert b.text_lengths.tolist() == [9, 14]
    assert b.output_lengths.tolist() == [33, 25]
    # Gate: 1 from last valid frame onward.
    assert b.gate[0, 31] == 0 and b.gate[0, 32] == 1 and b.gate[0, 39] == 1
    assert b.gate[1, 24] == 1
    # Padded mel region is zero.
    assert np.all(b.mels[1, :, 25:] == 0)


def test_collate_never_truncates():
    hp = HParams()
    hp.add_params(dict(text_buckets=[8], mel_buckets=[20]))
    samples = [(np.ones(30, np.int32), np.zeros((80, 77), np.float32), 0,
                np.zeros(5, np.float32))]
    b = collate(samples, hp)
    assert b.text.shape[1] == 30
    assert b.mels.shape[2] == 80  # 77 rounded to window multiple


def test_dataset_end_to_end(tmp_path):
    # Two tiny wavs + a filelist; run the full dataset -> batch path.
    hp = HParams()
    hp.add_params(dict(text_buckets=[64], mel_buckets=[200], batch_size=2,
                       vesus_path=None))
    wavs = tmp_path / "wavs"
    os.makedirs(wavs)
    rng = np.random.RandomState(0)
    for name in ("a.wav", "b.wav"):
        write_wav(str(wavs / name),
                  (rng.randn(11025) * 0.1).astype(np.float32), 22050)
    fl = tmp_path / "list.txt"
    fl.write_text("a.wav|Hello world.\nb.wav|Testing one two three.\n")

    ds = TextMelDataset([str(fl)], hp, str(wavs) + "/",
                        mel_cache_dir=str(tmp_path / "cache"))
    assert len(ds) == 2
    loader = DataLoader(ds, hp, batch_size=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b.mels.shape == (2, 80, 200)
    assert b.text_lengths.min() > 0
    # Mel cache was written and is reused.
    assert len(os.listdir(tmp_path / "cache")) == 2
    b2 = next(iter(DataLoader(ds, hp, batch_size=2)))
    assert b2.mels.shape == b.mels.shape


def test_synthetic_dataset_loader():
    hp = HParams()
    hp.add_params(dict(batch_size=4))
    ds = SyntheticDataset(hp, size=8, t_in=(10, 20), t_out=(40, 80), seed=1)
    loader = DataLoader(ds, hp, batch_size=4)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].mels.shape[2] % 20 == 0


def test_length_aware_pooling_reduces_padding():
    """Pooled length sorting batches similar lengths together: the average
    collated T_out over an epoch must drop vs unpooled shuffling, and every
    sample must still appear exactly once."""
    from gantron_tpu.config import HParams
    from gantron_tpu.data.dataset import DataLoader, SyntheticDataset

    hp = HParams()
    hp.add_params(dict(batch_size=8, text_buckets=[48, 96, 192],
                       mel_buckets=[100, 200, 400, 600, 900]))
    ds = SyntheticDataset(hp, size=256, t_in=(10, 180), t_out=(60, 860))

    def epoch_stats(sort_pool):
        hp.add_param("sort_pool_batches", sort_pool)
        loader = DataLoader(ds, hp, shuffle=True, drop_last=True)
        t_outs, count = [], 0
        for batch in loader:
            t_outs.append(batch.mels.shape[2])
            count += batch.text.shape[0]
        return float(np.mean(t_outs)), count

    mean_unpooled, n1 = epoch_stats(1)
    mean_pooled, n2 = epoch_stats(8)
    assert n1 == n2 == 256
    assert mean_pooled < mean_unpooled * 0.85, (mean_pooled, mean_unpooled)
