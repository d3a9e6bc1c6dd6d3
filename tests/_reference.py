"""Import the ACTUAL PyTorch reference implementation as a parity oracle.

The reference at /root/reference is a flat repo whose modules (model.py,
layers.py, utils.py, hparams.py, text/) import CUDA and libraries that are
not installed here (librosa, unidecode, inflect) and hard-code ``.cuda()``
calls. This module stubs exactly what the *model graph* needs so
``reference.model.Tacotron2`` runs on CPU:

  * librosa/unidecode/inflect -> import-time stubs (never called by the
    model forward pass);
  * torch.Tensor.cuda -> identity (reference model.py:187, 275, 469);
  * model.get_mask_from_lengths -> CPU equivalent (reference utils.py:20-24
    allocates a torch.cuda.LongTensor);
  * torch.nn.functional.dropout -> identity while ``no_dropout()`` is active
    (the reference prenet dropout is hard-wired on, model.py:104).

Nothing from the reference is copied; it is imported and executed.
"""

import contextlib
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")
        util = types.ModuleType("librosa.util")
        filters.mel = None  # only touched if TacotronSTFT is instantiated
        util.pad_center = None
        util.tiny = None
        librosa.filters = filters
        librosa.util = util
        librosa.load = None
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
        sys.modules["librosa.util"] = util
    if "unidecode" not in sys.modules:
        unidecode = types.ModuleType("unidecode")
        from gantron_tpu.text.ascii_fold import ascii_fold
        unidecode.unidecode = ascii_fold
        sys.modules["unidecode"] = unidecode
    if "inflect" not in sys.modules:
        inflect = types.ModuleType("inflect")

        class _Engine:
            def __getattr__(self, name):
                raise NotImplementedError(
                    "inflect stub: reference number expansion not available")

        inflect.engine = _Engine
        sys.modules["inflect"] = inflect


def import_reference():
    """Returns the reference ``model`` module, CPU-runnable."""
    import torch

    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    # The reference assumes CUDA exists (utils.py:20-24, model.py:187).
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore

    import model as ref_model  # noqa: F401  (resolves to /root/reference)

    def _cpu_mask(lengths):
        max_len = int(torch.max(lengths).item())
        ids = torch.arange(0, max_len, device=lengths.device)
        return (ids[None, :] < lengths[:, None]).bool()

    ref_model.get_mask_from_lengths = _cpu_mask
    return ref_model


def reference_hparams(**overrides):
    """The reference HParams with overrides applied (hparams.py:7-149)."""
    import_reference()
    from hparams import HParams as RefHParams

    hp = RefHParams()
    for k, v in overrides.items():
        setattr(hp, k, v)
    return hp


@contextlib.contextmanager
def no_dropout():
    """Neutralize dropout on BOTH frameworks for deterministic comparison.

    The prenet's dropout is intentionally always-on (reference model.py:104);
    numerical comparison requires switching it off on both sides.
    """
    import torch.nn.functional as F

    import gantron_tpu.models.tacotron2 as ours

    torch_dropout = F.dropout
    ours_dropout = ours._dropout
    F.dropout = lambda x, p=0.5, training=False, inplace=False: x
    ours._dropout = lambda x, rate, key: x
    try:
        yield
    finally:
        F.dropout = torch_dropout
        ours._dropout = ours_dropout


@contextlib.contextmanager
def fixed_torch_rand(arrays):
    """Make ``torch.rand`` return pre-drawn values (keyed by shape) so the
    reference's internal noise draws (model.py:187, 275, 469, 692) can be
    mirrored exactly on the JAX side."""
    import torch

    queues = {}
    for a in arrays:
        queues.setdefault(tuple(a.shape), []).append(
            torch.from_numpy(np.asarray(a, np.float32)))

    orig = torch.rand

    def fake_rand(*sizes, **kwargs):
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        q = queues.get(tuple(sizes))
        if q:
            return q.pop(0).clone()
        return orig(*sizes, **kwargs)

    torch.rand = fake_rand
    try:
        yield
    finally:
        torch.rand = orig
