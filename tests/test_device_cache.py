"""Device-resident feature cache: parity vs the native packed loader path.

The cached train path must be a pure re-plumbing: same batch ordering, same
normalized features, same GT waveform segments as the host-assembled
PackedLoader path (data/device_cache.py vs data/packed.py +
trainer._segment_batch)."""

import numpy as np
import pytest

from optispeech_tpu.config import DataStatistics
from optispeech_tpu.data.device_cache import DeviceCacheLoader, DeviceFeatureCache, PackedArena
from optispeech_tpu.data.packed import PackedDataset, PackedLoader, get_native_lib, pack_dataset
from optispeech_tpu.ops.segments import host_sample_segment_starts, host_slice_wav_segments

from test_packed_dataset import _write_reference_format

needs_native = pytest.mark.skipif(get_native_lib() is None, reason="native lib unavailable")

HOP = 64
N_FEATS = 20


@pytest.fixture
def pak(tmp_path, rng):
    filelist = _write_reference_format(tmp_path, rng, n=12, n_feats=N_FEATS, hop=HOP)
    return pack_dataset(str(filelist), str(tmp_path / "t.pak"), n_feats=N_FEATS,
                        hop_length=HOP)


def _stats():
    return DataStatistics(mel_mean=-1.2, mel_std=2.1, energy_mean=18.0,
                          energy_std=6.0, pitch_mean=180.0, pitch_std=55.0)


def test_arena_reads_raw_items(pak, rng):
    """Pure-Python mmap reader returns the exact packed payloads."""
    arena = PackedArena(pak)
    assert arena.n_items == 12 and arena.n_feats == N_FEATS and arena.hop_length == HOP
    for i in (0, 5, 11):
        assert arena.text(i).shape == (arena.text_lens[i],)
        assert arena.mel(i).shape == (N_FEATS, arena.mel_lens[i])
        assert arena.wav(i).shape == (arena.wav_lens[i],)
        assert np.isfinite(arena.mel(i)).all()
    arena.close()


@needs_native
def test_gather_matches_native_assemble(pak, rng):
    """cache.gather == PackedDataset.assemble + host wav segment slice."""
    import jax

    stats = _stats()
    cache = DeviceFeatureCache(pak, stats, f_min=80.0, text_bucket=16, mel_bucket=32)
    ds = PackedDataset(pak, stats, f_min=80.0)

    idx = np.array([3, 0, 7, 10], np.int64)
    t_text = int(np.ceil(ds.text_lens[idx].max() / 16) * 16)
    t_mel = int(np.ceil(ds.mel_lens[idx].max() / 32) * 32)
    host = ds.assemble(idx, text_bucket=16, mel_bucket=32)
    assert host["mel"].shape[-1] == t_mel

    seg = 24
    seg_rng = np.random.default_rng(11)
    start = host_sample_segment_starts(seg_rng, host["mel_lengths"], seg)
    wav_seg_host = host_slice_wav_segments(host["wav"], start, seg, HOP)

    dev = jax.jit(cache.gather, static_argnums=(2, 3, 4))(
        idx.astype(np.int32), start.astype(np.int32), t_text, t_mel, seg
    )
    np.testing.assert_array_equal(np.asarray(dev["x"]), host["x"])
    np.testing.assert_array_equal(np.asarray(dev["x_lengths"]), host["x_lengths"])
    np.testing.assert_array_equal(np.asarray(dev["mel_lengths"]), host["mel_lengths"])
    np.testing.assert_allclose(np.asarray(dev["mel"]), host["mel"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev["pitches"]), host["pitches"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev["energies"]), host["energies"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev["wav_seg"]), wav_seg_host,
                               rtol=1e-6, atol=1e-7)


@needs_native
def test_loader_matches_packed_loader_ordering(pak):
    """Same seed => DeviceCacheLoader yields the identical global batches
    (indices + padded shapes) as PackedLoader, and resumes identically."""
    stats = _stats()
    cache = DeviceFeatureCache(pak, stats, text_bucket=16, mel_bucket=32)
    ds = PackedDataset(pak, stats)

    light = DeviceCacheLoader(cache, batch_size=4, text_bucket=16, mel_bucket=32,
                              shuffle=True, seed=3)
    heavy = PackedLoader(ds, batch_size=4, text_bucket=16, mel_bucket=32,
                         shuffle=True, seed=3)
    lbs, hbs = list(light), list(heavy)
    assert len(lbs) == len(hbs) == 3
    for lb, hb in zip(lbs, hbs):
        assert lb["t_text"] == hb["x"].shape[1]
        assert lb["t_mel"] == hb["mel"].shape[2]
        np.testing.assert_array_equal(lb["mel_lengths"], hb["mel_lengths"])
        # the indices reproduce the heavy batch exactly
        re = ds.assemble(lb["idx"].astype(np.int64), text_bucket=16, mel_bucket=32)
        np.testing.assert_array_equal(re["x"], hb["x"])

    # resume contract (inherited from PackedLoader)
    loader = DeviceCacheLoader(cache, batch_size=4, text_bucket=16, mel_bucket=32,
                               shuffle=True, seed=3)
    it = iter(loader)
    next(it)
    saved = loader.state_dict()
    resumed = DeviceCacheLoader(cache, batch_size=4, text_bucket=16, mel_bucket=32,
                                shuffle=True, seed=3)
    resumed.load_state_dict(saved)
    rest = list(resumed)
    assert len(rest) == 2
    np.testing.assert_array_equal(rest[0]["idx"], lbs[1]["idx"])


@needs_native
def test_loader_shards_cover_global_batch(pak):
    """2-shard slices concatenate to the exact global batch with identical
    static (t_text, t_mel) on both shards — the multi-host compile contract."""
    stats = _stats()
    cache = DeviceFeatureCache(pak, stats, text_bucket=16, mel_bucket=32)
    mk = lambda sid, n: DeviceCacheLoader(
        cache, batch_size=4, text_bucket=16, mel_bucket=32, shuffle=True, seed=5,
        shard_id=sid, num_shards=n)
    for g, a, b in zip(iter(mk(0, 1)), iter(mk(0, 2)), iter(mk(1, 2))):
        assert a["t_text"] == b["t_text"] == g["t_text"]
        assert a["t_mel"] == b["t_mel"] == g["t_mel"]
        np.testing.assert_array_equal(np.concatenate([a["idx"], b["idx"]]), g["idx"])


@needs_native
def test_trainer_cached_path_matches_host_path(pak, tmp_path):
    """End-to-end: Trainer.fit over a DeviceCacheLoader produces the SAME
    parameter trajectory as over the host-assembled PackedLoader (same seed,
    same batches, same segment rng stream) — the cached input path is pure
    re-plumbing, not a semantic change."""
    import dataclasses

    import jax

    from optispeech_tpu.training.trainer import Trainer

    from test_train_step import tiny_experiment

    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, log_every_n_steps=100, val_every_n_steps=1000, ckpt_every_n_steps=100,
        num_devices=4, seed=7,
        data=dataclasses.replace(cfg.data, statistics=_stats(), batch_size=4),
    )

    def run(loader):
        trainer = Trainer(cfg, out_dir=str(tmp_path / f"run_{type(loader).__name__}"))
        state = trainer.fit(loader, None, max_steps=2)
        return jax.tree_util.tree_leaves(jax.device_get(state.g_params))

    host = run(PackedLoader(PackedDataset(pak, _stats()), batch_size=4,
                            text_bucket=16, mel_bucket=64, shuffle=True, seed=9))
    cache = DeviceFeatureCache(pak, _stats(), text_bucket=16, mel_bucket=64)
    cached = run(DeviceCacheLoader(cache, batch_size=4, text_bucket=16,
                                   mel_bucket=64, shuffle=True, seed=9))
    # atol covers 1-ulp input rounding (C vs numpy normalization) amplified
    # through two GAN update steps
    for a, b in zip(host, cached):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


@needs_native
def test_scan_step_matches_sequential_steps(pak):
    """make_cached_scan_step over K=2 light batches == two sequential
    make_cached_train_step calls (same rng-free path: segment starts are
    inputs), so the multi-step dispatch is pure amortization."""
    import jax

    from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
    from optispeech_tpu.models.generator import OptiSpeechGenerator
    from optispeech_tpu.training.state import init_train_state
    from optispeech_tpu.training.step import make_cached_scan_step, make_cached_train_step

    from test_train_step import tiny_experiment

    cfg = tiny_experiment(pretraining_steps=0)
    cache = DeviceFeatureCache(pak, _stats(), text_bucket=16, mel_bucket=64)
    gen = OptiSpeechGenerator(cfg.generator)
    disc = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state0 = init_train_state(cfg, gen, disc, jax.random.PRNGKey(0))

    t_text, t_mel = cache.t_text_max, cache.t_mel_max
    rng = np.random.default_rng(3)
    ks = np.stack([
        np.stack([rng.permutation(12)[:4].astype(np.int32),
                  rng.integers(0, 8, 4).astype(np.int32)], axis=1)
        for _ in range(2)
    ])  # (K=2, B=4, 2)

    seq = make_cached_train_step(cfg, gen, disc, cache)
    s = state0
    for k in range(2):
        s, logs_last = seq(s, ks[k], t_text=t_text, t_mel=t_mel)

    scan = make_cached_scan_step(cfg, gen, disc, cache)
    s2, logs_k = scan(state0, ks, t_text=t_text, t_mel=t_mel)

    assert int(np.asarray(s2.step)) == int(np.asarray(s.step)) == 2
    np.testing.assert_allclose(
        np.asarray(logs_k["total_loss/generator"])[-1],
        np.asarray(logs_last["total_loss/generator"]), rtol=1e-5)
    # atol covers XLA fusing the scan body differently from the standalone
    # step graph (float reassociation, observed ~2e-7 on a handful of params);
    # bound set just above the observed drift (ADVICE r4: keep this guarantee
    # tight rather than leaving 10x headroom)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s.g_params)),
                    jax.tree_util.tree_leaves(jax.device_get(s2.g_params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-7)


@needs_native
def test_cache_truncates_long_items(tmp_path, rng):
    """max_mel_len clamps arena width, lengths, and gathered features, matching
    PackedDataset.assemble's truncation."""
    filelist = _write_reference_format(tmp_path, rng, n=6, n_feats=N_FEATS, hop=HOP)
    pak = pack_dataset(str(filelist), str(tmp_path / "trunc.pak"), n_feats=N_FEATS,
                       hop_length=HOP)
    stats = _stats()
    cache = DeviceFeatureCache(pak, stats, text_bucket=16, mel_bucket=32,
                               max_text_len=12, max_mel_len=48)
    assert cache.t_text_max == 16 and cache.t_mel_max == 64
    ds = PackedDataset(pak, stats)
    idx = np.arange(4, dtype=np.int64)
    host = ds.assemble(idx, text_bucket=16, mel_bucket=32, max_text_len=12,
                       max_mel_len=48)
    dev = cache.gather(idx.astype(np.int32), np.zeros(4, np.int32),
                       host["x"].shape[1], host["mel"].shape[2], 16)
    np.testing.assert_array_equal(np.asarray(dev["x"]), host["x"])
    np.testing.assert_array_equal(np.asarray(dev["x_lengths"]), host["x_lengths"])
    np.testing.assert_array_equal(np.asarray(dev["mel_lengths"]), host["mel_lengths"])
    np.testing.assert_allclose(np.asarray(dev["mel"]), host["mel"], rtol=1e-5, atol=1e-6)
