"""GANtron-TPU: a TPU-native (JAX/XLA/Pallas) emotional speech synthesis
framework with the capabilities of GANtron (Tacotron2 + GAN discriminator +
emotion/noise conditioning + multi-speaker support).

Layer map:
  * ``gantron_tpu.text``     — text frontend (cleaners, symbol codec)
  * ``gantron_tpu.audio``    — STFT / mel DSP in jnp (+ Pallas fused kernel)
  * ``gantron_tpu.data``     — filelists, WAV IO, bucketed static-shape batching
  * ``gantron_tpu.models``   — Tacotron2 generator, discriminators, classifier,
                               WaveGlow vocoder (Flax)
  * ``gantron_tpu.losses``   — Tacotron2 loss, attention-guide, adversarial
  * ``gantron_tpu.train``    — jitted G/D train steps, GAN schedule, Orbax ckpt
  * ``gantron_tpu.parallel`` — mesh + sharding helpers (DP over ICI)
  * ``gantron_tpu.eval``     — emotion classifier pipeline, study/inference
"""

__version__ = "0.1.0"

# Operational escape hatch: GANTRON_PLATFORM=cpu pins the JAX backend for
# every CLI/script importing this package. Needed because site hooks can
# re-set JAX_PLATFORMS after the user's environment does (the axon hook
# re-points it at a possibly-unreachable tunnelled TPU, which HANGS backend
# init rather than raising); ``jax.config.update`` wins over the env var as
# long as it runs before first device use — importing gantron_tpu qualifies.
import os as _os

_platform = _os.environ.get("GANTRON_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
