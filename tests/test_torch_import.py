"""Torch-checkpoint import: structural round-trip + numerical parity of the
converted ConvNeXt block against a freshly-written torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from optispeech_tpu.compat.torch_import import convert_torch_generator_state_dict
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.models.modules.convnext import ConvNeXtBackbone

from test_generator import make_batch, tiny_cfg


class _TorchConvNeXtBlock(nn.Module):
    """Oracle with the reference's layer names/semantics (convnext.py:8-47),
    written fresh for this test."""

    def __init__(self, dim, intermediate_dim, lsiv):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, intermediate_dim)
        self.pwconv2 = nn.Linear(intermediate_dim, dim)
        self.gamma = nn.Parameter(lsiv * torch.ones(dim))

    def forward(self, x):  # x: (B, C, T)
        residual = x
        x = self.dwconv(x)
        x = x.transpose(1, 2)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = torch.nn.functional.gelu(x)
        x = self.pwconv2(x)
        x = self.gamma * x
        x = x.transpose(1, 2)
        return residual + x


class _TorchBackbone(nn.Module):
    def __init__(self, dim, intermediate_dim, n):
        super().__init__()
        self.convnext = nn.ModuleList(
            [_TorchConvNeXtBlock(dim, intermediate_dim, 1.0 / n) for _ in range(n)]
        )
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # (B, C, T) -> (B, T, C)
        for blk in self.convnext:
            x = blk(x)
        return self.final_layer_norm(x.transpose(1, 2))


def test_convnext_numerical_parity_torch_to_flax(rng):
    dim, inter, n = 16, 32, 2
    torch.manual_seed(0)
    tmodel = _TorchBackbone(dim, inter, n)
    sd = {f"enc.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from optispeech_tpu.compat.torch_import import _convnext_backbone

    flax_params = _convnext_backbone("enc", lambda k: sd[k], n)
    x = rng.normal(size=(2, 10, dim)).astype(np.float32)

    fb = ConvNeXtBackbone(dim=dim, intermediate_dim=inter, num_layers=n, drop_path=0.0)
    out_flax = fb.apply({"params": jax.tree_util.tree_map(jnp.asarray, flax_params)}, jnp.asarray(x))
    out_torch = tmodel(torch.tensor(x).transpose(1, 2)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out_flax), out_torch, rtol=1e-4, atol=1e-5)


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree).shape


def test_full_generator_import_structure(rng):
    """Inverse-map our own init params to reference torch names, convert back,
    and check the tree matches exactly (names, shapes, values)."""
    gen_cfg = tiny_cfg()
    model = OptiSpeechGenerator(gen_cfg)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k, "segment": k}, **batch, deterministic=True
    ))(key)
    params = jax.device_get(variables["params"])

    # inverse mapping: flax path -> torch state_dict name
    def to_torch_name_and_value(path, value):
        p = list(path)
        v = np.asarray(value)
        if p[-1] == "kernel" and v.ndim == 3:
            v = np.transpose(v, (2, 1, 0))
            suffix = "weight"
        elif p[-1] == "kernel":
            v = np.transpose(v, (1, 0))
            suffix = "weight"
        elif p[-1] == "scale" and p[-2] not in ("embed_positions", "pos_emb"):
            suffix = "weight"
        elif p[-1] == "embedding":
            suffix = "weight"
        elif p[-1] in ("bias", "gamma"):
            suffix = p[-1]
        elif p[-1] == "scale":
            suffix = "scale"
        else:
            suffix = p[-1]

        def seg(s):
            if s.startswith("block_"):
                return f"convnext.{s.split('_')[1]}"
            if s.startswith("conv_") and s.split("_")[1].isdigit():
                return f"conv.{s.split('_')[1]}.0"
            if s.startswith("ln_"):
                return f"conv.{s.split('_')[1]}.2"
            if s == "depthwise":
                return "depthwise_conv"
            if s == "pointwise":
                return "pointwise_conv"
            if s == "embed" and p[0] in ("pitch_predictor", "energy_predictor") and len(p) == 3:
                return "embed.0"
            return s
        parts = [seg(s) for s in p[:-1] if s not in ("gamma",)]
        if p[-1] == "gamma":
            name = ".".join(parts + ["gamma"])
        else:
            name = ".".join(parts) + "." + suffix
        # duration predictor: flax nests under .predictor, torch does not
        name = name.replace("duration_predictor.predictor.", "duration_predictor.")
        return name, v

    sd = {}
    for path, _ in _tree_paths(params):
        node = params
        for s in path:
            node = node[s]
        name, v = to_torch_name_and_value(path, node)
        sd[name] = v

    converted = convert_torch_generator_state_dict(sd, gen_cfg)
    orig_paths = dict(_tree_paths(params))
    conv_paths = dict(_tree_paths(converted))
    assert set(orig_paths) == set(conv_paths), (
        set(orig_paths) ^ set(conv_paths)
    )
    for path in orig_paths:
        node_o, node_c = params, converted
        for s in path:
            node_o, node_c = node_o[s], node_c[s]
        np.testing.assert_allclose(np.asarray(node_o), np.asarray(node_c), atol=1e-6,
                                   err_msg=str(path))
