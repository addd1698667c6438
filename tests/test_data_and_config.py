"""Data pipeline, config layering, text frontend, values tests."""

import json
import os

import numpy as np
import pytest

from optispeech_tpu.config import (
    DataStatistics,
    ExperimentConfig,
    from_dict,
    merge_overrides,
    to_dict,
)
from optispeech_tpu.data.datamodule import BucketedCollate, DataLoader, SyntheticDataset, TextWavDataset
from optispeech_tpu.text import TextProcessor
from optispeech_tpu.text.symbols import BOS_ID, EOS_ID, PAD_ID, phonemes_to_ids
from optispeech_tpu.values import InferenceInputs, numpy_pad_sequences, numpy_unpad_sequences


def test_config_roundtrip_and_overrides():
    cfg = ExperimentConfig()
    d = to_dict(cfg)
    cfg2 = from_dict(ExperimentConfig, d)
    assert cfg == cfg2
    cfg3 = merge_overrides(cfg, {"generator.dim": 192, "data.batch_size": 16})
    assert cfg3.generator.dim == 192 and cfg3.data.batch_size == 16
    with pytest.raises(KeyError):
        merge_overrides(cfg, {"generator.nonexistent": 1})


def test_yaml_config_layering(tmp_path):
    from optispeech_tpu.utils.yamlcfg import load_experiment

    cfg = load_experiment("default")
    assert cfg.generator.encoder.kind == "convnext"
    light = load_experiment("light")
    assert light.generator.encoder.kind == "lightspeech"
    assert light.generator.duration_predictor.separable
    assert light.optimizer.lr == cfg.optimizer.lr  # inherited from base
    mike = load_experiment("mike")
    assert mike.data.preprocess.preemphasis_filter_coef == 0.5
    assert mike.data.statistics.pitch_mean == 113.678925

    over = load_experiment("default", overrides=["generator.dim=64", "data.batch_size=4"])
    assert over.generator.dim == 64 and over.data.batch_size == 4


def test_text_processor_char_tokenizer():
    tp = TextProcessor(tokenizer="char", add_blank=True, add_bos_eos=True,
                       normalize_text=True, languages=["en-us"])
    ids, clean = tp("Hello   world!", split_sentences=False)
    assert ids[0] == BOS_ID and ids[-1] == EOS_ID
    assert ids[1] == PAD_ID  # interspersed blank
    assert "  " not in clean
    d = tp.asdict()
    tp2 = TextProcessor.from_dict(d)
    ids2, _ = tp2("Hello   world!", split_sentences=False)
    assert ids == ids2


def test_symbols_roundtrip():
    from optispeech_tpu.text.symbols import ids_to_phonemes

    text = "həˈloʊ wɜːld"
    ids = phonemes_to_ids(text)
    assert ids_to_phonemes(ids) == text


def test_values_padding_roundtrip():
    seqs = [[1, 2, 3], [4], [5, 6]]
    padded = numpy_pad_sequences(seqs)
    assert padded.shape == (3, 3)
    unpadded = numpy_unpad_sequences(padded, np.array([3, 1, 2]))
    assert [list(u) for u in unpadded] == seqs
    inp = InferenceInputs.from_ids_and_lengths(ids=seqs, lengths=[3, 1, 2], clean_text="t")
    assert inp.x.shape == (3, 3)


def test_bucketed_collate_shapes():
    ds = SyntheticDataset(n_items=8, n_feats=20, hop_length=64, text_range=(10, 30), mel_range=(40, 100))
    collate = BucketedCollate(n_feats=20, statistics=DataStatistics(), hop_length=64,
                              text_bucket=16, mel_bucket=32)
    batch = collate([ds[i] for i in range(4)])
    assert batch["x"].shape[1] % 16 == 0
    assert batch["mel"].shape[2] % 32 == 0
    assert batch["wav"].shape[1] == batch["mel"].shape[2] * 64
    assert (batch["x_lengths"] <= batch["x"].shape[1]).all()
    # normalization applied
    assert abs(batch["mel"].mean()) < 10


def test_dataloader_iterates_and_groups():
    ds = SyntheticDataset(n_items=32, n_feats=20, hop_length=64)
    collate = BucketedCollate(n_feats=20, statistics=DataStatistics(), hop_length=64,
                              text_bucket=16, mel_bucket=64)
    loader = DataLoader(ds, batch_size=4, collate=collate, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 8
    assert all(b["x"].shape[0] == 4 for b in batches)
    # second epoch reshuffles
    batches2 = list(loader)
    assert len(batches2) == 8


def test_dataloader_shards_partition_each_global_batch():
    """Per-host sharding (multi-host DP): every shard sees the same global
    batch order, takes a disjoint batch_size/num_shards slice, and pads to
    the GLOBAL batch max — so concatenating the shards' arrays reproduces the
    single-host global batch exactly even with heterogeneous lengths."""
    ds = SyntheticDataset(n_items=32, n_feats=20, hop_length=64)
    collate = BucketedCollate(n_feats=20, statistics=DataStatistics(), hop_length=64,
                              text_bucket=16, mel_bucket=64)
    mk = lambda sid, n: DataLoader(ds, batch_size=4, collate=collate, shuffle=True,
                                   seed=0, shard_id=sid, num_shards=n)
    for g, a, b in zip(iter(mk(0, 1)), iter(mk(0, 2)), iter(mk(1, 2))):
        for key in ("x", "wav", "mel", "pitches", "x_lengths", "mel_lengths"):
            assert a[key].shape == b[key].shape, key
            np.testing.assert_array_equal(
                np.concatenate([a[key], b[key]], axis=0), g[key], err_msg=key
            )


def test_dataloader_sharded_partial_batch_pads_by_wrapping():
    """drop_last=False with a dataset size that is not a multiple of the
    batch: under sharding the partial global batch wraps (DistributedSampler
    convention) so every shard still gets an equal, non-empty slice."""
    ds = SyntheticDataset(n_items=10, n_feats=20, hop_length=64)
    collate = BucketedCollate(n_feats=20, statistics=DataStatistics(), hop_length=64,
                              text_bucket=16, mel_bucket=64)
    mk = lambda sid: DataLoader(ds, batch_size=4, collate=collate, shuffle=False,
                                drop_last=False, seed=0, shard_id=sid, num_shards=2)
    a_batches, b_batches = list(mk(0)), list(mk(1))
    assert len(a_batches) == len(b_batches) == 3  # 4 + 4 + 2->wrapped to 4
    for a, b in zip(a_batches, b_batches):
        assert a["x"].shape == b["x"].shape
        assert a["x"].shape[0] == 2  # every shard slice full-size, never empty
    # the wrapped batch duplicates the partial batch's own items, not garbage
    last = mk(0)._batch_indices()[-1]
    assert len(last) == 4 and len(set(last)) == 2
    assert last[:2] == last[2:]  # wrap repeats the partial batch


def test_dataloader_state_dict_resumes_mid_epoch():
    ds = SyntheticDataset(n_items=32, n_feats=20, hop_length=64)
    collate = BucketedCollate(n_feats=20, statistics=DataStatistics(), hop_length=64,
                              text_bucket=16, mel_bucket=64)
    mk = lambda: DataLoader(ds, batch_size=4, collate=collate, shuffle=True, seed=0)
    loader = mk()
    it = iter(loader)
    consumed = [next(it) for _ in range(3)]
    saved = loader.state_dict()
    assert saved == {"epoch": 0, "pos": 3, "seed": 0}

    # a fresh loader restored from the state continues with batch 3 onward
    resumed = mk()
    resumed.load_state_dict(saved)
    rest = list(resumed)
    full = list(mk())
    assert len(rest) == len(full) - 3
    for got, want in zip(rest, full[3:]):
        np.testing.assert_array_equal(got["x"], want["x"])
    # epoch rolled over after finishing
    assert resumed.state_dict()["epoch"] == 1
    assert resumed.state_dict()["pos"] == 0


def test_textwav_dataset_reads_reference_format(tmp_path):
    # write a datafile pair in the reference's on-disk format
    base = tmp_path / "data" / "utt1"
    base.parent.mkdir()
    with open(base.with_suffix(".json"), "w") as f:
        json.dump({"phoneme_ids": [1, 5, 9], "text": "hi", "sid": 2}, f)
    np.savez(
        base.with_suffix(".npz"),
        wav=np.zeros(640, np.float32),
        mel=np.zeros((20, 10), np.float32),
        energy=np.ones(10, np.float32),
        pitch=np.array([10.0, 0.0, 100.0, 200.0, 15.0, 300.0, 0.0, 50.0, 400.0, 30.0], np.float32),
    )
    filelist = tmp_path / "train.txt"
    filelist.write_text(str(base) + "\n")
    ds = TextWavDataset(str(filelist), f_min=80.0)
    item = ds[0]
    assert list(item["x"]) == [1, 5, 9]
    assert item["sid"] == 2
    # uv_threshold = 80//3.5 = 22.0 -> pitches <= 22 zeroed
    assert (item["pitch"][item["pitch"] > 0] > 22).all()
    assert item["pitch"][0] == 0.0


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from optispeech_tpu.models.optispeech import OptiSpeech
    from test_generator import tiny_cfg

    from optispeech_tpu.config import DataConfig, TextProcessorConfig

    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(text_bucket_size=16, mel_bucket_size=32,
                        text_processor=TextProcessorConfig(tokenizer="char")),
    )
    api = OptiSpeech(cfg, seed=0)
    path = str(tmp_path / "ckpt")
    api.save_checkpoint(path)
    api2 = OptiSpeech.load_from_checkpoint(path)
    assert api2.cfg == api.cfg
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(np.allclose(a, b)), api.params, api2.params)
    )
    assert chex_equal

    # fused=True (the serving default) flips the Pallas routing knobs on the
    # loaded config but changes nothing else; off-TPU the blocks self-gate
    # back to XLA so outputs are identical on this harness
    api3 = OptiSpeech.load_from_checkpoint(path, fused=True)
    assert api3.cfg.generator.vocoder.fused_pallas
    if api3.cfg.generator.decoder.kind == "convnext":
        assert api3.cfg.generator.decoder.fused_pallas
    inp = api.prepare_input("ab c", split_sentences=False)
    np.testing.assert_allclose(
        np.asarray(api3.synthesise(inp).wav), np.asarray(api2.synthesise(inp).wav)
    )
