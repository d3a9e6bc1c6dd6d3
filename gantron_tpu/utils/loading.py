"""Model loading helpers for inference/eval CLIs
(reference: inference_samples.py:18-25, train.py:114-125)."""

import os

import orbax.checkpoint as ocp

from gantron_tpu.models import Tacotron2, make_discriminator


def load_checkpoint_tree(checkpoint_path):
    """Restore the raw checkpoint pytree (no template needed)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(checkpoint_path))


def load_generator(checkpoint_path, hp):
    """Returns (model, variables) ready for ``model.apply``."""
    payload = load_checkpoint_tree(checkpoint_path)
    state = payload["state"]
    model = Tacotron2(hp)
    variables = {"params": state["g_params"],
                 "batch_stats": state.get("g_batch_stats", {})}
    return model, variables


def load_discriminator(checkpoint_path, hp):
    payload = load_checkpoint_tree(checkpoint_path)
    state = payload["state"]
    model = make_discriminator(hp)
    return model, {"params": state["d_params"]}
