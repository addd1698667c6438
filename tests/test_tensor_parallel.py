"""Tensor-parallel inference over a 2-D (data, model) mesh: FFN weights
sharded on the model axis must reproduce the replicated result (GSPMD inserts
the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np

from optispeech_tpu.config import DataConfig, ExperimentConfig, TextProcessorConfig
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.models.optispeech import OptiSpeech
from optispeech_tpu.parallel.tp import make_2d_mesh, shard_params_tp

from test_generator import tiny_cfg


def test_tp_sharded_ffn_matches_replicated():
    assert jax.device_count() >= 8
    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(text_bucket_size=16, mel_bucket_size=32,
                        text_processor=TextProcessorConfig(tokenizer="char")),
    )
    api = OptiSpeech(cfg, seed=0)
    inputs = api.prepare_input("tensor parallel check", split_sentences=False)

    ref = api.synthesise_on_device(inputs, n_frames=64)
    ref_wav = np.asarray(ref["wav"])

    mesh = make_2d_mesh(4, 2)
    sharded = shard_params_tp(api.params, mesh)
    # at least the FFN kernels must actually be sharded
    flat = jax.tree_util.tree_leaves_with_path(sharded)
    any_sharded = any(
        not leaf.sharding.is_fully_replicated
        for path, leaf in flat
        if "pwconv1" in "/".join(getattr(k, "key", "") for k in path)
    )
    assert any_sharded

    api.params = sharded
    out = api.synthesise_on_device(inputs, n_frames=64)
    tp_wav = np.asarray(out["wav"])
    np.testing.assert_allclose(tp_wav, ref_wav, atol=2e-4)
