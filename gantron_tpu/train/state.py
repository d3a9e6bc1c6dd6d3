"""Training state for the GAN (generator + discriminator).

One pytree carrying both networks, both Adam states, the BatchNorm running
stats, the step counter and the PRNG key — so a single Orbax save captures
everything needed to resume (improving on the reference, which omits the
discriminator from checkpoints — train.py:158-166).
"""

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from gantron_tpu.models import Tacotron2, make_discriminator


@flax.struct.dataclass
class GANTrainState:
    step: jax.Array                 # global iteration
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    d_params: Any
    d_opt_state: Any
    rng: jax.Array


def make_optimizer(clip_norm: float, weight_decay: float):
    """torch.optim.Adam semantics: external grad clip, then L2-coupled weight
    decay folded into the gradient, then Adam moments. The learning rate is
    applied separately in the step (host-controlled halving schedule,
    reference train.py:433-435)."""
    chain = []
    if clip_norm and clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)


def create_train_state(hp, rng, sample_batch):
    """Initialize models + optimizers from a (host, numpy) sample batch."""
    generator = Tacotron2(hp)
    discriminator = make_discriminator(hp)

    text, text_lengths, mels, gate, speaker, emotions, output_lengths = (
        jnp.asarray(x) for x in sample_batch)

    k_g, k_d, k_drop, k_noise, k_state = jax.random.split(rng, 5)
    # Initialization runs under ONE jit: eager model.init dispatches a
    # separate tiny compile per parameter initializer (dozens of ops), which
    # is minutes of round-trips on a remote-tunnel device; jitted it is a
    # single compile + a single device execution. init_full (not __call__)
    # so conditional submodules (the InfoGAN style encoder) get params too.
    g_init = jax.jit(lambda r, *a: generator.init(
        *((r,) + a), train=False, method=generator.init_full))
    g_vars = g_init({"params": k_g, "dropout": k_drop, "noise": k_noise},
                    text, text_lengths, mels, speaker, emotions,
                    output_lengths)

    T_out = mels.shape[2]
    W = hp.discriminator_window
    pad_T = ((T_out + W - 1) // W) * W
    if hp.discriminator_type == "linear":
        d_in = jnp.zeros((1, 1, W * hp.n_mel_channels))
    else:
        d_in = jnp.zeros((mels.shape[0], pad_T, hp.n_mel_channels))
    d_vars = jax.jit(discriminator.init)(
        {"params": k_d, "dropout": k_drop}, d_in)

    g_tx = make_optimizer(hp.grad_clip_thresh, hp.weight_decay)
    d_clip = hp.clipping_value if hp.gradient_penalty_lambda <= 0 else 0.0
    d_tx = make_optimizer(d_clip, hp.weight_decay)

    def init_state(g_vars, d_vars):
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            g_batch_stats=g_vars.get("batch_stats", {}),
            g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"],
            d_opt_state=d_tx.init(d_vars["params"]),
            rng=k_state,
        )

    state = jax.jit(init_state)(g_vars, d_vars)
    return state, generator, discriminator, g_tx, d_tx
