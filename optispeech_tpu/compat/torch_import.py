"""Import reference PyTorch checkpoints into the JAX model.

The BASELINE parity target is mel-L1 <= 1e-2 vs the reference's torch
checkpoint — that requires loading reference Lightning checkpoints
(state_dict keys like `generator.encoder.convnext.0.dwconv.weight`,
/root/reference/optispeech/model/*) into our flax param tree.

Covered: TextEmbedding, ConvNeXt backbones (encoder/decoder/vocoder trunk),
variance predictors (standard + separable "lite"), LightSpeech backbones,
alignment module, WaveNeXt vocoder, speaker/language embeddings.

Layout conventions converted:
- torch Conv1d weight (out, in/groups, k)  -> flax Conv kernel (k, in/groups, out)
- torch Linear weight (out, in)            -> flax Dense kernel (in, out)
- torch LayerNorm weight/bias              -> flax scale/bias
"""

from typing import Callable, Optional

import numpy as np

from ..utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def _conv(w):
    return np.transpose(np.asarray(w), (2, 1, 0))


def _dense(w):
    return np.transpose(np.asarray(w), (1, 0))


def _ln(prefix, get):
    return {"scale": np.asarray(get(f"{prefix}.weight")), "bias": np.asarray(get(f"{prefix}.bias"))}


def _conv_params(prefix, get, bias=True):
    out = {"kernel": _conv(get(f"{prefix}.weight"))}
    if bias:
        out["bias"] = np.asarray(get(f"{prefix}.bias"))
    return out


def _dense_params(prefix, get, bias=True):
    out = {"kernel": _dense(get(f"{prefix}.weight"))}
    if bias:
        out["bias"] = np.asarray(get(f"{prefix}.bias"))
    return out


def _convnext_backbone(prefix, get, num_layers):
    """ConvNeXtBackbone (reference modules/convnext.py:50-103)."""
    out = {}
    for i in range(num_layers):
        p = f"{prefix}.convnext.{i}"
        out[f"block_{i}"] = {
            "dwconv": _conv_params(f"{p}.dwconv", get),
            "norm": _ln(f"{p}.norm", get),
            "pwconv1": _dense_params(f"{p}.pwconv1", get),
            "pwconv2": _dense_params(f"{p}.pwconv2", get),
            "gamma": np.asarray(get(f"{p}.gamma")),
        }
    out["final_layer_norm"] = _ln(f"{prefix}.final_layer_norm", get)
    return out


def _conv_separable(prefix, get):
    """ConvSeparable (reference modules/layers.py:455-476)."""
    return {
        "depthwise": {"kernel": _conv(get(f"{prefix}.depthwise_conv.weight"))},
        "pointwise": _conv_params(f"{prefix}.pointwise_conv", get),
    }


def _variance_predictor(prefix, get, num_layers, separable):
    """VariancePredictor (reference modules/core.py:34-97). torch wraps each
    layer as Sequential(conv, ReLU, LayerNorm, Dropout) -> indices 0 and 2."""
    out = {}
    for i in range(num_layers):
        if separable:
            out[f"conv_{i}"] = _conv_separable(f"{prefix}.conv.{i}.0", get)
        else:
            out[f"conv_{i}"] = _conv_params(f"{prefix}.conv.{i}.0", get)
        out[f"ln_{i}"] = _ln(f"{prefix}.conv.{i}.2", get)
    out["linear"] = _dense_params(f"{prefix}.linear", get)
    return out


def _pitch_predictor(prefix, get, num_layers, separable):
    """PitchPredictor (reference modules/core.py:136-176): predictor + embed
    conv (torch Sequential index 0; ConvSeparable in the lite variant)."""
    embed = (
        _conv_separable(f"{prefix}.embed.0", get)
        if separable
        else _conv_params(f"{prefix}.embed.0", get)
    )
    return {
        "predictor": _variance_predictor(f"{prefix}.predictor", get, num_layers, separable),
        "embed": embed,
    }


def _lightspeech_layers(prefix, get, n_layers, final_ln_key="layer_norm"):
    out = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "layer_norm": _ln(f"{p}.layer_norm", get),
            "conv1": _conv_separable(f"{p}.conv1", get),
            "conv2": _conv_separable(f"{p}.conv2", get),
        }
    out[final_ln_key] = _ln(f"{prefix}.layer_norm", get)
    return out


def _alignment(prefix, get):
    """AlignmentModule (reference alignments.py:14-39)."""
    return {
        "t_conv1": _conv_params(f"{prefix}.t_conv1", get),
        "t_conv2": _conv_params(f"{prefix}.t_conv2", get),
        "f_conv1": _conv_params(f"{prefix}.f_conv1", get),
        "f_conv2": _conv_params(f"{prefix}.f_conv2", get),
        "f_conv3": _conv_params(f"{prefix}.f_conv3", get),
    }


def _transformer_backbone(prefix, get, n_blocks):
    """ESPnet FS2 transformer encoder (reference modules/_transformer/encoder.py)
    wrapped by modules/transformer.py — state-dict names like
    `<prefix>.transformer.encoders.{i}.self_attn.linear_q.weight`."""
    base = f"{prefix}.transformer"
    out = {"pos_alpha": np.asarray(get(f"{base}.embed.0.alpha")).reshape(1)}
    for i in range(n_blocks):
        p = f"{base}.encoders.{i}"
        out[f"self_attn_{i}"] = {
            "linear_q": _dense_params(f"{p}.self_attn.linear_q", get),
            "linear_k": _dense_params(f"{p}.self_attn.linear_k", get),
            "linear_v": _dense_params(f"{p}.self_attn.linear_v", get),
            "linear_out": _dense_params(f"{p}.self_attn.linear_out", get),
        }
        out[f"ffn_{i}"] = {
            "w_1": _conv_params(f"{p}.feed_forward.w_1", get),
            "w_2": _conv_params(f"{p}.feed_forward.w_2", get),
        }
        out[f"norm1_{i}"] = _ln(f"{p}.norm1", get)
        out[f"norm2_{i}"] = _ln(f"{p}.norm2", get)
    out["after_norm"] = _ln(f"{base}.after_norm", get)
    return out


def _conformer_backbone(prefix, get, n_blocks):
    """ESPnet conformer encoder (reference modules/_conformer/encoder.py:32)
    wrapped by modules/conformer.py — state-dict names like
    `<prefix>.conformer.encoders.{i}.self_attn.linear_q.weight`.

    The conv-module BatchNorm1d's frozen running stats are folded into the
    affine `norm_scale`/`norm_bias` params of our `conv_norm="affine"` path:
    scale = gamma / sqrt(var + eps), bias = beta - mean * scale.
    """
    base = f"{prefix}.conformer"
    out = {}
    for i in range(n_blocks):
        p = f"{base}.encoders.{i}"
        out[f"self_attn_{i}"] = {
            "linear_q": _dense_params(f"{p}.self_attn.linear_q", get),
            "linear_k": _dense_params(f"{p}.self_attn.linear_k", get),
            "linear_v": _dense_params(f"{p}.self_attn.linear_v", get),
            "linear_out": _dense_params(f"{p}.self_attn.linear_out", get),
            "linear_pos": _dense_params(f"{p}.self_attn.linear_pos", get, bias=False),
            "pos_bias_u": np.asarray(get(f"{p}.self_attn.pos_bias_u")),
            "pos_bias_v": np.asarray(get(f"{p}.self_attn.pos_bias_v")),
        }
        out[f"ff_{i}"] = {
            "w_1": _conv_params(f"{p}.feed_forward.w_1", get),
            "w_2": _conv_params(f"{p}.feed_forward.w_2", get),
        }
        out[f"ff_macaron_{i}"] = {
            "w_1": _conv_params(f"{p}.feed_forward_macaron.w_1", get),
            "w_2": _conv_params(f"{p}.feed_forward_macaron.w_2", get),
        }
        gamma = np.asarray(get(f"{p}.conv_module.norm.weight"))
        beta = np.asarray(get(f"{p}.conv_module.norm.bias"))
        mean = np.asarray(get(f"{p}.conv_module.norm.running_mean"))
        var = np.asarray(get(f"{p}.conv_module.norm.running_var"))
        bn_scale = gamma / np.sqrt(var + 1e-5)  # torch BatchNorm1d default eps
        out[f"conv_module_{i}"] = {
            "pointwise_conv1": _conv_params(f"{p}.conv_module.pointwise_conv1", get),
            "depthwise_conv": _conv_params(f"{p}.conv_module.depthwise_conv", get),
            "norm_scale": bn_scale,
            "norm_bias": beta - mean * bn_scale,
            "pointwise_conv2": _conv_params(f"{p}.conv_module.pointwise_conv2", get),
        }
        for norm in ("norm_ff", "norm_mha", "norm_ff_macaron", "norm_conv", "norm_final"):
            out[f"{norm}_{i}"] = _ln(f"{p}.{norm}", get)
    out["after_norm"] = _ln(f"{base}.after_norm", get)
    return out


def _lstm_cell(prefix, get):
    """torch nn.LSTM (1 layer, batch_first) -> flax OptimizedLSTMCell params.

    torch packs the four gates row-wise in (4H, H) weight matrices, order
    (i, f, g, o); flax keeps one (H, H) Dense per gate — input-side kernels
    without bias (ii/if/ig/io), recurrent-side with bias (hi/hf/hg/ho), so
    the single flax bias is torch's bias_ih + bias_hh. Gate semantics match
    (i/f/o sigmoid, g tanh)."""
    w_ih = np.asarray(get(f"{prefix}.weight_ih_l0"))  # (4H, H)
    w_hh = np.asarray(get(f"{prefix}.weight_hh_l0"))
    b = np.asarray(get(f"{prefix}.bias_ih_l0")) + np.asarray(get(f"{prefix}.bias_hh_l0"))
    h = w_ih.shape[1]
    gates = ("i", "f", "g", "o")
    out = {}
    for k, gate in enumerate(gates):
        out[f"i{gate}"] = {"kernel": w_ih[k * h:(k + 1) * h].T}
        out[f"h{gate}"] = {"kernel": w_hh[k * h:(k + 1) * h].T,
                           "bias": b[k * h:(k + 1) * h]}
    return out


def _leanspeech_layers(prefix, get, n_layers):
    """LeanSpeechBackbone (reference modules/leanspeech.py:13-96): per block a
    1-layer LSTM (tanh-ed), a ConvGLU (ConvSeparable -> LayerNorm -> GLU with
    an inner residual), and a final LayerNorm."""
    out = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "OptimizedLSTMCell_0": _lstm_cell(f"{p}.lstm", get),
            "conv": {
                "conv": _conv_separable(f"{p}.conv.conv.0", get),
                "ln": _ln(f"{p}.conv.conv.1", get),
            },
            "final_layer_norm": _ln(f"{p}.final_layer_norm", get),
        }
    return out


def _backbone(prefix, get, bb_cfg, is_decoder=False):
    if bb_cfg.kind == "convnext":
        return _convnext_backbone(prefix, get, bb_cfg.num_layers)
    if bb_cfg.kind == "lightspeech":
        out = _lightspeech_layers(prefix, get, len(bb_cfg.kernel_sizes))
        if is_decoder:
            out["pos_emb"] = {"scale": np.asarray(get(f"{prefix}.pos_emb.scale"))}
        return out
    if bb_cfg.kind == "leanspeech":
        return _leanspeech_layers(prefix, get, bb_cfg.num_layers)
    if bb_cfg.kind == "transformer":
        return _transformer_backbone(prefix, get, bb_cfg.num_blocks)
    if bb_cfg.kind == "conformer":
        if bb_cfg.conv_norm != "affine":
            raise ValueError(
                "conformer checkpoint import requires conv_norm='affine' in the "
                "BackboneConfig: the reference conv module uses BatchNorm1d, whose "
                "frozen running stats are folded into an affine transform on import "
                "(training-from-scratch keeps the default LayerNorm)"
            )
        return _conformer_backbone(prefix, get, bb_cfg.num_blocks)
    raise NotImplementedError(f"torch import for backbone kind `{bb_cfg.kind}`")


def convert_torch_generator_state_dict(state_dict: dict, gen_cfg) -> dict:
    """Map a reference generator state_dict (numpy values) onto our flax
    params tree. Keys may carry a `generator.` prefix (Lightning checkpoint)."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("generator."):
            k = k[len("generator."):]
        sd[k] = np.asarray(v)

    missing = []

    def get(key):
        if key not in sd:
            missing.append(key)
            return np.zeros(())
        return sd[key]

    params = {
        "text_embedding": {
            "embed_tokens": {"embedding": np.asarray(get("text_embedding.embed_tokens.weight"))},
            "embed_positions": {"scale": np.asarray(get("text_embedding.embed_positions.scale"))},
        },
        "encoder": _backbone("encoder", get, gen_cfg.encoder),
        "decoder": _backbone("decoder", get, gen_cfg.decoder, is_decoder=True),
        "duration_predictor": {
            "predictor": _variance_predictor(
                "duration_predictor", get,
                gen_cfg.duration_predictor.num_layers, gen_cfg.duration_predictor.separable,
            )
        },
        "pitch_predictor": _pitch_predictor(
            "pitch_predictor", get,
            gen_cfg.pitch_predictor.num_layers, gen_cfg.pitch_predictor.separable,
        ),
        "energy_predictor": _pitch_predictor(
            "energy_predictor", get,
            gen_cfg.energy_predictor.num_layers, gen_cfg.energy_predictor.separable,
        ),
        "alignment_module": _alignment("alignment_module", get),
        "vocoder": {
            "embed": _conv_params("vocoder.embed", get),
            "norm": _ln("vocoder.norm", get),
            "backbone": _convnext_backbone("vocoder.backbone", get, gen_cfg.vocoder.num_layers),
            "head": {
                "linear_1": _dense_params("vocoder.head.linear_1", get),
                "linear_2": _dense_params("vocoder.head.linear_2", get, bias=False),
            },
        },
    }
    if gen_cfg.num_speakers > 1:
        params["sid_embed"] = {"embedding": np.asarray(get("sid_embed.weight"))}
    if gen_cfg.num_languages > 1:
        params["lid_embed"] = {"embedding": np.asarray(get("lid_embed.weight"))}

    if missing:
        raise KeyError(f"state_dict missing {len(missing)} keys, e.g. {missing[:5]}")
    return params


def load_torch_checkpoint(path: str, gen_cfg) -> dict:
    """Load a reference Lightning .ckpt and convert the generator weights."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    np_sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
             if hasattr(v, "detach") and k.startswith("generator.")}
    return convert_torch_generator_state_dict(np_sd, gen_cfg)
