from gantron_tpu.data.dataset import (Batch, DataLoader, SyntheticDataset,
                                      TextMelDataset, collate, pick_bucket)
from gantron_tpu.data.filelists import (load_cremad_ravdess,
                                        load_filepaths_and_text, load_vesus,
                                        load_vesus_full)
from gantron_tpu.data.wav import load_wav, read_wav, write_wav

__all__ = [
    "Batch", "DataLoader", "SyntheticDataset", "TextMelDataset", "collate",
    "pick_bucket", "load_filepaths_and_text", "load_vesus",
    "load_cremad_ravdess", "load_vesus_full", "load_wav", "read_wav",
    "write_wav",
]
