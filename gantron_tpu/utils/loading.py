"""Model loading helpers for inference/eval CLIs
(reference: inference_samples.py:18-25, train.py:114-125)."""

import os

import orbax.checkpoint as ocp

from gantron_tpu.models import Tacotron2, make_discriminator


def load_checkpoint_tree(checkpoint_path):
    """Restore the raw checkpoint pytree (no template needed)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(checkpoint_path))


def restore_structure(template, restored):
    """Re-impose the template's pytree node types on a template-free orbax
    restore. Orbax returns NamedTuple params (e.g. ops.rnn.LSTMParams) as
    plain lists/dicts; feeding those back into ``model.apply`` raises a
    flax ScopeParamShapeError, so rebuild the original containers."""
    if hasattr(template, "_fields"):  # NamedTuple
        if isinstance(restored, dict):
            try:
                vals = [restored[k] for k in sorted(restored, key=int)]
            except (TypeError, ValueError):
                vals = [restored[k] for k in template._fields]
        else:
            vals = list(restored)
        return type(template)(*[restore_structure(t, r)
                                for t, r in zip(template, vals)])
    if isinstance(template, dict):
        return {k: restore_structure(v, restored[k])
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return type(template)(restore_structure(t, r)
                              for t, r in zip(template, restored))
    return restored


def _init_generator_variables(model, hp):
    import jax
    import jax.numpy as jnp

    B, T_in = 1, 8
    T_out = 8 * max(1, getattr(hp, "n_frames_per_step", 1))
    # One jitted compile instead of per-parameter eager dispatches (slow on
    # remote-tunnel devices); see train.state.create_train_state. init_full
    # so the template covers conditional submodules (InfoGAN style encoder).
    init = jax.jit(lambda r, *a: model.init(
        *((r,) + a), train=False, method=model.init_full))
    return init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        jnp.ones((B, T_in), jnp.int32), jnp.full((B,), T_in, jnp.int32),
        jnp.zeros((B, hp.n_mel_channels, T_out)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, 5)), jnp.full((B,), T_out, jnp.int32))


def load_generator(checkpoint_path, hp):
    """Returns (model, variables) ready for ``model.apply``."""
    payload = load_checkpoint_tree(checkpoint_path)
    state = payload["state"]
    model = Tacotron2(hp)
    init_vars = _init_generator_variables(model, hp)
    params = restore_structure(init_vars["params"], state["g_params"])
    batch_stats = restore_structure(init_vars.get("batch_stats", {}),
                                    state.get("g_batch_stats", {}))
    return model, {"params": params, "batch_stats": batch_stats}


def load_discriminator(checkpoint_path, hp):
    import jax
    import jax.numpy as jnp

    payload = load_checkpoint_tree(checkpoint_path)
    state = payload["state"]
    model = make_discriminator(hp)
    W = hp.discriminator_window
    if hp.discriminator_type == "linear":
        d_in = jnp.zeros((1, 1, W * hp.n_mel_channels))
    else:
        d_in = jnp.zeros((1, W, hp.n_mel_channels))
    d_vars = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, d_in)
    return model, {"params": restore_structure(d_vars["params"],
                                               state["d_params"])}
