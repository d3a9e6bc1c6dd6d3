"""Shared plumbing for the evidence/study scripts (evidence_run.py,
gan_mode_study.py): the ~96-dim study model config and metric-log readout.
One definition so the two studies cannot drift apart."""

import json
import os


def small_model_params(iterations):
    """The ~96-dim study model: big enough to speak the toy tone language,
    small enough to train in minutes on one chip."""
    return dict(
        symbols_embedding_dim=96, encoder_embedding_dim=96,
        encoder_n_convolutions=2, attention_rnn_dim=128, decoder_rnn_dim=128,
        prenet_dim=48, attention_dim=48, attention_location_n_filters=8,
        attention_location_kernel_size=15, postnet_embedding_dim=96,
        postnet_n_convolutions=3, discriminator_dim=96,
        max_decoder_steps=64,
        scan_unroll=2, mesh_shape=[1], validation_audio=False,
        batch_size=16, iterations=iterations,
        iters_per_checkpoint=max(iterations // 5, 1),
        disc_warmp_up=100, attn_steps=iterations // 2,
        g_learning_rate=1e-3, d_learning_rate=7e-4,
        text_buckets=[12], mel_buckets=[60],
    )


def final_validation(metrics_path):
    """Last logged validation losses from a MetricLogger JSONL file."""
    final_val = {}
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                for k in ("Validation mel loss", "Validation gate loss"):
                    if k in rec:
                        final_val[k] = rec[k]
    return final_val
