"""Toy "tone language" corpus: each character maps to a distinct sine
frequency, so text and audio are genuinely correlated and attention
alignment is learnable in minutes. Used by the e2e wav-training test and
the alignment-emergence demo (docs/alignment_demo.md); real training uses
LJSpeech/VESUS via the same filelist format (reference data_utils.py:13-79).
"""

import os

import numpy as np

from gantron_tpu.data.wav import write_wav

SR = 22050
CHARS = "aeiou mnst"
CHAR_SAMPLES = 1536  # ~70 ms per character


def synth_utterance(text: str, rng) -> np.ndarray:
    """Each char -> a fixed-frequency tone burst; space -> near-silence."""
    parts = []
    for ch in text:
        idx = CHARS.index(ch)
        t = np.arange(CHAR_SAMPLES) / SR
        freq = 180.0 * (1.3 ** idx)
        amp = 0.02 if ch == " " else 0.5
        burst = amp * np.sin(2 * np.pi * freq * t)
        burst *= np.hanning(CHAR_SAMPLES) ** 0.25  # soften edges
        parts.append(burst)
    wav = np.concatenate(parts)
    return (wav + rng.randn(wav.size) * 0.003).astype(np.float32)


def build_corpus(root: str, n_utts: int = 20, n_train: int = None,
                 min_chars: int = 4, max_chars: int = 9, seed: int = 0):
    """Write wavs + LJSpeech-format filelists under ``root``.

    Returns (wav_dir_with_sep, train_filelist, val_filelist).
    """
    n_train = n_train if n_train is not None else max(n_utts - 4, 1)
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    letters = list(CHARS.strip())
    lines = []
    for i in range(n_utts):
        n_chars = rng.randint(min_chars, max_chars)
        text = "".join(rng.choice(letters) for _ in range(n_chars))
        write_wav(os.path.join(wav_dir, f"u{i}.wav"),
                  synth_utterance(text, rng), SR)
        lines.append(f"u{i}.wav|{text}")
    train_list = os.path.join(root, "train.txt")
    val_list = os.path.join(root, "val.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(lines[:n_train]) + "\n")
    with open(val_list, "w") as f:
        f.write("\n".join(lines[n_train:]) + "\n")
    return wav_dir + os.sep, train_list, val_list
