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


def test_extensible_float32_wav_decodes_correctly(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE float32 must decode via the SubFormat GUID,
    not be guessed as int32 PCM from the bit depth."""
    import struct

    from gantron_tpu.data.wav import read_wav

    audio = (np.sin(np.linspace(0, 40 * np.pi, 2000)) * 0.5).astype("<f4")
    raw = audio.tobytes()
    # fmt body: extensible (0xFFFE), 1 ch, 22050 Hz, float32 + cbSize=22,
    # validBits=32, channelMask=0, SubFormat GUID starting with 0x0003.
    guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(12)
    fmt_body = struct.pack("<HHIIHH", 0xFFFE, 1, 22050, 22050 * 4, 4, 32)
    fmt_body += struct.pack("<HHI", 22, 32, 0) + guid
    path = tmp_path / "ext.wav"
    with open(path, "wb") as f:
        payload = (b"WAVE"
                   + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                   + b"data" + struct.pack("<I", len(raw)) + raw)
        f.write(b"RIFF" + struct.pack("<I", len(payload)) + payload)
    x, rate = read_wav(str(path))
    assert rate == 22050
    np.testing.assert_allclose(x, audio, atol=1e-6)


def test_filelist_skips_blank_lines(tmp_path):
    from gantron_tpu.data.filelists import load_filepaths_and_text

    p = tmp_path / "list.txt"
    p.write_text("a.wav|hello\n\nb.wav|world\n\n")
    rows = load_filepaths_and_text(str(p), "/w/")
    assert rows == [["/w/a.wav", "hello"], ["/w/b.wav", "world"]]


def test_mel_cache_distinguishes_same_basenames(tmp_path):
    """Same-named wavs in different dirs must not share a cache file, and
    changing mel hparams must not reuse stale caches."""
    from gantron_tpu.config import HParams
    from gantron_tpu.data.dataset import TextMelDataset
    from gantron_tpu.data.wav import write_wav

    for sub, freq in (("a", 220.0), ("b", 880.0)):
        d = tmp_path / sub
        d.mkdir()
        t = np.linspace(0, 0.4, int(0.4 * 22050))
        write_wav(str(d / "1.wav"), 0.4 * np.sin(2 * np.pi * freq * t))
    flist = tmp_path / "list.txt"
    flist.write_text("a/1.wav|one\nb/1.wav|two\n")

    hp = HParams()
    cache = tmp_path / "cache"
    cache.mkdir()
    ds = TextMelDataset([str(flist)], hp, str(tmp_path) + "/",
                        mel_cache_dir=str(cache))
    mel_a = ds.get_mel(str(tmp_path / "a/1.wav"))
    mel_b = ds.get_mel(str(tmp_path / "b/1.wav"))
    assert len(list(cache.iterdir())) == 2
    assert not np.allclose(mel_a, mel_b)

    hp2 = HParams()
    hp2.add_param("n_mel_channels", 40)
    ds2 = TextMelDataset([str(flist)], hp2, str(tmp_path) + "/",
                         mel_cache_dir=str(cache))
    mel_a2 = ds2.get_mel(str(tmp_path / "a/1.wav"))
    assert mel_a2.shape[0] == 40  # stale 80-mel cache NOT reused


def test_prefetch_loader_propagates_errors():
    from gantron_tpu.data.dataset import PrefetchLoader

    def bad_iter():
        yield 1
        raise RuntimeError("corrupt sample")

    class L:
        def __iter__(self):
            return bad_iter()

        def __len__(self):
            return 2

    import pytest

    it = iter(PrefetchLoader(L()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="corrupt sample"):
        next(it)


def test_prefetch_loader_worker_exits_on_early_break():
    import threading
    import time

    from gantron_tpu.data.dataset import PrefetchLoader

    class Endless:
        def __iter__(self):
            return iter(range(10000))

        def __len__(self):
            return 10000

    before = threading.active_count()
    it = iter(PrefetchLoader(Endless()))
    assert next(it) == 0
    it.close()  # what an abandoned for-loop does on GC
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
