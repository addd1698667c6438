"""Native packed-dataset loader: parity vs the Python collate path."""

import json

import numpy as np
import pytest

from optispeech_tpu.config import DataStatistics
from optispeech_tpu.data.datamodule import BucketedCollate, TextWavDataset
from optispeech_tpu.data.packed import PackedDataset, PackedLoader, get_native_lib, pack_dataset


def _write_reference_format(tmp_path, rng, n=6, n_feats=20, hop=64):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    paths = []
    for i in range(n):
        t_text = int(rng.integers(5, 20))
        t_mel = int(rng.integers(30, 90))
        base = data_dir / f"utt{i}"
        with open(base.with_suffix(".json"), "w") as f:
            json.dump({"phoneme_ids": rng.integers(1, 100, t_text).tolist(), "text": "t"}, f)
        np.savez(
            base.with_suffix(".npz"),
            wav=(rng.normal(size=t_mel * hop) * 0.3).astype(np.float32),
            mel=rng.normal(size=(n_feats, t_mel)).astype(np.float32),
            energy=np.abs(rng.normal(size=t_mel)).astype(np.float32) * 20,
            pitch=np.abs(rng.normal(size=t_mel) * 60 + 180).astype(np.float32),
        )
        paths.append(str(base))
    filelist = tmp_path / "train.txt"
    filelist.write_text("\n".join(paths) + "\n")
    return filelist


needs_native = pytest.mark.skipif(get_native_lib() is None, reason="native lib unavailable")


@needs_native
def test_packed_matches_python_collate(tmp_path, rng):
    filelist = _write_reference_format(tmp_path, rng)
    pak = pack_dataset(str(filelist), str(tmp_path / "train.pak"), n_feats=20, hop_length=64)

    stats = DataStatistics()
    ds_py = TextWavDataset(str(filelist), f_min=80.0)
    collate = BucketedCollate(n_feats=20, statistics=stats, hop_length=64,
                              text_bucket=16, mel_bucket=32)
    batch_py = collate([ds_py[i] for i in range(4)])

    ds_c = PackedDataset(pak, stats, f_min=80.0)
    batch_c = ds_c.assemble(np.arange(4), text_bucket=16, mel_bucket=32)

    assert batch_c["x"].shape == batch_py["x"].shape
    assert batch_c["mel"].shape == batch_py["mel"].shape
    np.testing.assert_array_equal(batch_c["x"], batch_py["x"])
    np.testing.assert_array_equal(batch_c["x_lengths"], batch_py["x_lengths"])
    np.testing.assert_array_equal(batch_c["mel_lengths"], batch_py["mel_lengths"])
    np.testing.assert_allclose(batch_c["mel"], batch_py["mel"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batch_c["wav"], batch_py["wav"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batch_c["pitches"], batch_py["pitches"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batch_c["energies"], batch_py["energies"], rtol=1e-5, atol=1e-6)


@needs_native
def test_packed_loader_iterates(tmp_path, rng):
    filelist = _write_reference_format(tmp_path, rng, n=12)
    pak = pack_dataset(str(filelist), str(tmp_path / "t.pak"), n_feats=20, hop_length=64)
    ds = PackedDataset(pak, DataStatistics())
    loader = PackedLoader(ds, batch_size=4, text_bucket=16, mel_bucket=32)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["x"].shape[0] == 4
        assert b["mel"].shape[2] % 32 == 0
        assert np.isfinite(b["mel"]).all()


@needs_native
def test_packed_loader_shards_and_resumes(tmp_path, rng):
    """Multi-host + resume contract of the native loader mirrors DataLoader:
    shard slices concatenate to the exact global batch (global-max padding),
    and state_dict round-trips to the same remaining batches."""
    filelist = _write_reference_format(tmp_path, rng, n=16)
    pak = pack_dataset(str(filelist), str(tmp_path / "s.pak"), n_feats=20, hop_length=64)
    ds = PackedDataset(pak, DataStatistics())
    mk = lambda sid, n: PackedLoader(ds, batch_size=4, text_bucket=16, mel_bucket=32,
                                     shuffle=True, seed=5, shard_id=sid, num_shards=n)
    for g, a, b in zip(iter(mk(0, 1)), iter(mk(0, 2)), iter(mk(1, 2))):
        for key in ("x", "wav", "mel", "pitches", "x_lengths", "mel_lengths"):
            assert a[key].shape == b[key].shape, key
            np.testing.assert_array_equal(
                np.concatenate([a[key], b[key]], axis=0), g[key], err_msg=key
            )

    loader = mk(0, 1)
    it = iter(loader)
    next(it), next(it)
    saved = loader.state_dict()
    assert saved["pos"] == 2
    resumed = mk(0, 1)
    resumed.load_state_dict(saved)
    rest = list(resumed)
    full = list(mk(0, 1))
    assert len(rest) == len(full) - 2
    np.testing.assert_array_equal(rest[0]["x"], full[2]["x"])
    assert resumed.state_dict() == {"epoch": 1, "pos": 0, "seed": 5}
