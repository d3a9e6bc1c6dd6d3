"""Orbax checkpointing with reference-compatible naming/retention.

Semantics (reference train.py:143-166, 449-465):
  * save every ``iters_per_checkpoint`` as ``iter={i}_val-loss={v}.ckpt``;
  * delete the previous checkpoint when the new val loss improves on it;
  * separately keep the best-ever checkpoint.

Improvements over the reference (SURVEY §5 gaps): the discriminator params
and optimizer state ARE saved, as are BatchNorm stats and the PRNG key, so a
resume is bit-exact.
"""

import os
import re
import shutil
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"iter=(\d+)_val-loss=([-\d.einf]+)\.ckpt$")


class CheckpointManager:
    def __init__(self, output_directory: str):
        self.output_directory = os.path.abspath(output_directory)
        os.makedirs(self.output_directory, exist_ok=True)
        if jax.process_count() > 1:
            # Checkpoints here are host-side numpy trees (saved after
            # device_get, chief-only — see loop.train). Scope the orbax
            # barriers to THIS process, or a chief-only save deadlocks
            # waiting for processes that never call save (the 2-process
            # worker in tests/test_multihost.py saves on the chief only).
            pid = jax.process_index()
            opts = ocp.options.MultiprocessingOptions(
                primary_host=pid, active_processes={pid},
                barrier_sync_key_prefix=f"proc{pid}")
            self._ckptr = ocp.Checkpointer(
                ocp.StandardCheckpointHandler(),
                multiprocessing_options=opts)
        else:
            self._ckptr = ocp.StandardCheckpointer()
        self.prev_check: Optional[str] = None
        self.prev_val_loss = float("inf")
        self.best_val_loss = float("inf")
        self.best_val_loss_path: Optional[str] = None

    def _path(self, iteration: int, val_loss: float) -> str:
        return os.path.join(self.output_directory,
                            f"iter={iteration}_val-loss={round(val_loss, 6)}.ckpt")

    def save(self, state, iteration: int, val_loss: float,
             extra: Optional[dict] = None) -> str:
        path = self._path(iteration, val_loss)
        payload = {"state": jax.tree.map(np.asarray, state)}
        self._ckptr.save(path, payload, force=True)
        if hasattr(self._ckptr, "wait_until_finished"):  # async-backed only
            self._ckptr.wait_until_finished()
        if extra:
            import json

            with open(path + ".meta.json", "w") as f:
                json.dump(extra, f)

        # Retention (reference train.py:449-465): drop the previous ckpt if
        # the new val loss improves on it; separately track the best-ever
        # (deleting the superseded best). Sidecar .meta.json files go with
        # their checkpoints or they orphan-accumulate over a long run.
        def _drop(ckpt_path):
            shutil.rmtree(ckpt_path, ignore_errors=True)
            try:
                os.remove(ckpt_path + ".meta.json")
            except OSError:
                pass

        if self.prev_check is not None and val_loss < self.prev_val_loss:
            _drop(self.prev_check)
        if val_loss < self.best_val_loss:
            if (self.best_val_loss_path is not None
                    and os.path.exists(self.best_val_loss_path)):
                _drop(self.best_val_loss_path)
            self.best_val_loss = val_loss
            self.best_val_loss_path = path
        self.prev_check = path
        self.prev_val_loss = val_loss
        return path

    def restore(self, path: str, state_template):
        """Restore into the structure of ``state_template``."""
        payload = self._ckptr.restore(
            os.path.abspath(path),
            {"state": jax.tree.map(np.asarray, state_template)})
        return jax.tree.map(
            lambda t, v: v if not hasattr(t, "dtype") else np.asarray(v),
            state_template, payload["state"])

    @staticmethod
    def load_meta(path: str) -> Optional[dict]:
        """Side metadata saved next to the checkpoint (learning rates —
        the reference stores them inside the torch dict, train.py:158-166)."""
        import json

        meta_path = path + ".meta.json"
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            return json.load(f)

    @staticmethod
    def parse_name(path: str) -> Optional[Tuple[int, float]]:
        m = _CKPT_RE.search(os.path.basename(path))
        if not m:
            return None
        return int(m.group(1)), float(m.group(2))

    def latest(self) -> Optional[str]:
        best = None
        for name in os.listdir(self.output_directory):
            parsed = self.parse_name(name)
            if parsed and (best is None or parsed[0] > best[0]):
                best = (parsed[0], os.path.join(self.output_directory, name))
        return best[1] if best else None

    def best(self) -> Optional[str]:
        """The on-disk checkpoint with the lowest recorded val loss — what
        keep-best retention preserved (the reference tracks the same
        best-ever checkpoint, train.py:455-465). Ties go to the later
        iteration."""
        best = None
        for name in os.listdir(self.output_directory):
            parsed = self.parse_name(name)
            if parsed is None:
                continue
            key = (parsed[1], -parsed[0])
            if best is None or key < best[0]:
                best = (key, os.path.join(self.output_directory, name))
        return best[1] if best else None


# Reference dotted layer names -> our tree path prefixes (ignore_layers are
# the dataset-dependent layers whose shapes change across conditioning
# configs; reference hparams.py:25-28).
_TORCH_TO_TREE = {
    "decoder.attention_rnn.weight_ih": ("decoder", "attention_rnn"),
    "decoder.attention_layer.memory_layer.linear_layer.weight":
        ("decoder", "memory_w"),
    "decoder.decoder_rnn.weight_ih": ("decoder", "decoder_rnn"),
    "decoder.linear_projection.linear_layer.weight": ("decoder", "proj_w"),
    "decoder.gate_layer.linear_layer.weight": ("decoder", "gate_w"),
    "embedding.weight": ("embedding",),
}


def warm_start_filter(g_params, restored_g_params, ignore_layers):
    """Generator-weights-only warm start (reference train.py:128-140).

    Path-wise merge: for each parameter in the NEW model, take the restored
    value when the path exists in the checkpoint, shapes match, and the path
    is not under an ignored prefix -- otherwise keep the fresh init. Works
    across configs whose conditioning dims differ (the whole point of
    ``ignore_layers``).
    """
    skip_paths = {_TORCH_TO_TREE[l] for l in ignore_layers
                  if l in _TORCH_TO_TREE}

    def path_keys(path):
        return tuple(getattr(p, "key", getattr(p, "idx", None))
                     for p in path)

    restored_by_path = {
        path_keys(path): leaf for path, leaf in
        jax.tree_util.tree_flatten_with_path(restored_g_params)[0]}

    def merge(path, new_leaf):
        keys = path_keys(path)
        for skip in skip_paths:
            if keys[: len(skip)] == skip:
                return new_leaf
        restored = restored_by_path.get(keys)
        if restored is None or np.shape(restored) != np.shape(new_leaf):
            return new_leaf
        return restored

    return jax.tree_util.tree_map_with_path(merge, g_params)
