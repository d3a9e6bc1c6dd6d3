"""Checkpoint manager + warm-start merge tests."""

import numpy as np

import jax.numpy as jnp

from gantron_tpu.train.checkpoint import CheckpointManager, warm_start_filter


def test_warm_start_merges_by_path_and_shape():
    new = {
        "embedding": np.zeros((10, 4), np.float32),
        "decoder": {
            "attention_rnn": (np.zeros((6, 8)), np.zeros((2, 8)),
                              np.zeros((8,))),
            "memory_w": np.zeros((5, 3)),
            "proj_w": np.zeros((7, 2)),
            "query_w": np.zeros((2, 3)),
        },
    }
    restored = {
        "embedding": np.ones((10, 4), np.float32),
        "decoder": {
            "attention_rnn": (np.ones((9, 8)), np.ones((2, 8)),
                              np.ones((8,))),  # w_ih shape differs
            "memory_w": np.ones((4, 3)),  # shape differs (other config)
            "proj_w": np.ones((7, 2)),
            "query_w": np.ones((2, 3)),
        },
    }
    ignore = [
        "decoder.attention_rnn.weight_ih",
        "decoder.attention_layer.memory_layer.linear_layer.weight",
        "decoder.linear_projection.linear_layer.weight",
    ]
    out = warm_start_filter(new, restored, ignore)
    # Ignored prefixes keep the fresh init.
    assert np.all(np.asarray(out["decoder"]["attention_rnn"][0]) == 0)
    assert np.all(np.asarray(out["decoder"]["memory_w"]) == 0)
    assert np.all(np.asarray(out["decoder"]["proj_w"]) == 0)
    # Non-ignored matching layers are restored.
    assert np.all(np.asarray(out["embedding"]) == 1)
    assert np.all(np.asarray(out["decoder"]["query_w"]) == 1)


def test_ckpt_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    state = {"w": jnp.ones((3,))}
    p1 = mgr.save(state, 100, 2.0)
    p2 = mgr.save(state, 200, 1.0)  # better -> p1 deleted
    import os

    assert not os.path.exists(p1)
    assert os.path.exists(p2)
    p3 = mgr.save(state, 300, 3.0)  # worse -> p2 kept (prev & best)
    assert os.path.exists(p2)
    assert os.path.exists(p3)
    assert mgr.best_val_loss_path == p2
    parsed = mgr.parse_name(p3)
    assert parsed == (300, 3.0)
    assert mgr.latest().endswith("iter=300_val-loss=3.0.ckpt")
    # best() finds the keep-best survivor on disk — a FRESH manager (no
    # in-memory retention state), the deployment-load scenario.
    assert CheckpointManager(str(tmp_path)).best() == p2


def test_ckpt_best_tie_prefers_later_iteration(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    state = {"w": jnp.ones((3,))}
    mgr.save(state, 100, 2.0)
    p2 = mgr.save(state, 200, 2.0)  # equal -> both survive retention
    assert CheckpointManager(str(tmp_path)).best() == p2


def test_load_generator_from_real_checkpoint(tmp_path):
    """Template-free orbax restores turn LSTMParams NamedTuples into lists;
    load_generator must rebuild the original structure or every
    checkpoint-loading CLI crashes (ScopeParamShapeError)."""
    import jax
    import jax.numpy as jnp

    from gantron_tpu.train.checkpoint import CheckpointManager
    from gantron_tpu.train.state import create_train_state
    from gantron_tpu.utils.loading import load_generator

    from test_train_step import tiny_hp, synth_batch

    hp = tiny_hp()
    batch = synth_batch(hp)
    state, gen, disc, g_tx, d_tx = create_train_state(
        hp, jax.random.PRNGKey(0), tuple(batch))
    ckpt = CheckpointManager(str(tmp_path))
    path = ckpt.save(jax.device_get(state), 1, 1.0)

    model, variables = load_generator(path, hp)
    out = model.apply(
        variables, batch.text, batch.text_lengths, batch.mels, batch.speaker,
        batch.emotions, batch.output_lengths, train=False,
        rngs={"dropout": jax.random.PRNGKey(1),
              "noise": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out[1])).all()
    # Restored arrays equal the saved ones (spot-check an LSTM tuple leaf).
    a = state.g_params["decoder"]["attention_rnn"].w_ih
    b = variables["params"]["decoder"]["attention_rnn"].w_ih
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
