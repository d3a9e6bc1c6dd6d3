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
