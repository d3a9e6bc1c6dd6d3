"""Torch checkpoint interop: convert a reference GANtron state_dict into our
Flax parameter trees (and back), enabling the mel-MAE parity harness and
warm-starting from reference checkpoints (reference checkpoint layout:
train.py:158-166 — ``{'state_dict': generator, 'g_optimizer', ...}``).

Naming map (torch dotted paths -> our tree paths):
  embedding.weight                         -> params['embedding']
  encoder.convolutions.i.0.conv.*          -> encoder/conv_i/conv
  encoder.convolutions.i.1.* (BatchNorm)   -> encoder/bn_i/bn (+batch_stats)
  encoder.lstm.*_l0[_reverse]              -> encoder/lstm_fw|lstm_bw
  decoder.prenet.layers.i.linear_layer     -> decoder/prenet_wi
  decoder.attention_rnn.*                  -> decoder/attention_rnn
  decoder.attention_layer.query_layer.*    -> decoder/query_w       etc.
  decoder.decoder_rnn.*                    -> decoder/decoder_rnn
  decoder.linear_projection.linear_layer.* -> decoder/proj_w, proj_b
  decoder.gate_layer.linear_layer.*        -> decoder/gate_w, gate_b
  postnet.convolutions.i.0/1.*             -> postnet/conv_i, bn_i
  discriminator.i.module.0.* / .4.*        -> conv_i/conv, out (GAN disc)

Layout rules: Linear (out,in) -> kernel (in,out); Conv1d (out,in,k) ->
kernel (k,in,out); LSTM weight_* (4H,D) -> (D,4H) with b = b_ih + b_hh
(gate order i,f,g,o is shared).
"""

from typing import Dict, Tuple

import numpy as np


def _lin(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _lstm(sd, prefix):
    return (
        _lin(sd[f"{prefix}.weight_ih"]),
        _lin(sd[f"{prefix}.weight_hh"]),
        np.asarray(sd[f"{prefix}.bias_ih"]) + np.asarray(
            sd[f"{prefix}.bias_hh"]),
    )


def _bilstm_dir(sd, prefix, suffix):
    return (
        _lin(sd[f"{prefix}.weight_ih_l0{suffix}"]),
        _lin(sd[f"{prefix}.weight_hh_l0{suffix}"]),
        np.asarray(sd[f"{prefix}.bias_ih_l0{suffix}"]) + np.asarray(
            sd[f"{prefix}.bias_hh_l0{suffix}"]),
    )


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def tacotron2_from_torch(state_dict, hp) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for our ``Tacotron2``.

    ``state_dict``: mapping of torch names to numpy arrays (e.g.
    ``{k: v.numpy() for k, v in ckpt['state_dict'].items()}``).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {"encoder": {}, "decoder": {}, "postnet": {}}
    stats: Dict = {"encoder": {}, "postnet": {}}

    params["embedding"] = np.asarray(sd["embedding.weight"])
    if "speaker_embedding.weight" in sd:
        params["speaker_embedding"] = np.asarray(
            sd["speaker_embedding.weight"])

    for i in range(hp.encoder_n_convolutions):
        p = f"encoder.convolutions.{i}"
        params["encoder"][f"conv_{i}"] = {"conv": {
            "kernel": _conv(sd[f"{p}.0.conv.weight"]),
            "bias": np.asarray(sd[f"{p}.0.conv.bias"])}}
        bn_p, bn_s = _bn(sd, f"{p}.1")
        params["encoder"][f"bn_{i}"] = {"bn": bn_p}
        stats["encoder"][f"bn_{i}"] = {"bn": bn_s}
    params["encoder"]["lstm_fw"] = _bilstm_dir(sd, "encoder.lstm", "")
    params["encoder"]["lstm_bw"] = _bilstm_dir(sd, "encoder.lstm",
                                               "_reverse")

    d = params["decoder"]
    d["prenet_w0"] = _lin(sd["decoder.prenet.layers.0.linear_layer.weight"])
    d["prenet_w1"] = _lin(sd["decoder.prenet.layers.1.linear_layer.weight"])
    d["attention_rnn"] = _lstm(sd, "decoder.attention_rnn")
    d["query_w"] = _lin(
        sd["decoder.attention_layer.query_layer.linear_layer.weight"])
    d["memory_w"] = _lin(
        sd["decoder.attention_layer.memory_layer.linear_layer.weight"])
    d["v_w"] = _lin(sd["decoder.attention_layer.v.linear_layer.weight"])
    d["loc_conv_w"] = _conv(
        sd["decoder.attention_layer.location_layer.location_conv.conv.weight"])
    d["loc_dense_w"] = _lin(
        sd["decoder.attention_layer.location_layer.location_dense."
           "linear_layer.weight"])
    d["decoder_rnn"] = _lstm(sd, "decoder.decoder_rnn")
    d["proj_w"] = _lin(sd["decoder.linear_projection.linear_layer.weight"])
    d["proj_b"] = np.asarray(sd["decoder.linear_projection.linear_layer.bias"])
    d["gate_w"] = _lin(sd["decoder.gate_layer.linear_layer.weight"])
    d["gate_b"] = np.asarray(sd["decoder.gate_layer.linear_layer.bias"])

    for i in range(hp.postnet_n_convolutions):
        p = f"postnet.convolutions.{i}"
        params["postnet"][f"conv_{i}"] = {"conv": {
            "kernel": _conv(sd[f"{p}.0.conv.weight"]),
            "bias": np.asarray(sd[f"{p}.0.conv.bias"])}}
        bn_p, bn_s = _bn(sd, f"{p}.1")
        params["postnet"][f"bn_{i}"] = {"bn": bn_p}
        stats["postnet"][f"bn_{i}"] = {"bn": bn_s}

    return params, stats


def conv_discriminator_from_torch(state_dict, hp) -> Dict:
    """Conv discriminator weights (reference model.py:500-512)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    for i in range(4):
        params[f"conv_{i}"] = {"conv": {
            "kernel": _conv(sd[f"discriminator.{i}.module.0.weight"]),
            "bias": np.asarray(sd[f"discriminator.{i}.module.0.bias"])}}
    params["out"] = {"kernel": _conv(sd["discriminator.4.weight"]),
                     "bias": np.asarray(sd["discriminator.4.bias"])}
    return params


def linear_discriminator_from_torch(state_dict, hp) -> Dict:
    """Linear discriminator weights (reference model.py:543-554):
    discriminator.{0,1,2}.module.0 (DiscDense Linear) + discriminator.3
    (final Linear)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    for i in range(3):
        params[f"dense_{i}"] = {
            "kernel": _lin(sd[f"discriminator.{i}.module.0.weight"]),
            "bias": np.asarray(sd[f"discriminator.{i}.module.0.bias"])}
    params["out"] = {"kernel": _lin(sd["discriminator.3.weight"]),
                     "bias": np.asarray(sd["discriminator.3.bias"])}
    return params


def load_reference_checkpoint(path, hp):
    """Load a reference ``.ckpt`` (torch.save dict with 'state_dict') and
    convert the generator weights. Requires torch (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().float().numpy()
          for k, v in ckpt["state_dict"].items()}
    return tacotron2_from_torch(sd, hp)
