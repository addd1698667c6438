"""Device-resident training feature cache (TPU-first input path).

The reference feeds every batch from host DataLoader workers each step
(/root/reference/optispeech/dataset/text_wav_datamodule.py:196-266), so the
full padded mel/pitch/energy/text tensors cross the host->device link per
step. On this harness that link is both slow and leaks host RSS 1:1 with
bytes transferred (docs/evidence/host_link_leak.md), capping training at
~1.6 steps/s of a compiled 5.4 at batch 128.

TPU-native answer: the whole packed corpus is small next to HBM (the 600-utt
campaign corpus is ~0.4 GB padded; LJSpeech-scale mels are ~3.5 GB), so the
padded feature arenas are uploaded ONCE and every train step ships only
integer batch indices + segment starts (~1 KB). Batch assembly — row gather,
static slice to the bucketed (t_text, t_mel), GT waveform segment crop —
happens inside the jitted train step on device, where HBM bandwidth makes it
free.

Semantics match the native packed loader exactly (native/packed_dataset.cpp):
- uv-threshold pitch zeroing BEFORE normalization (uv = f_min // 3.5,
  reference text_wav_datamodule.py:147,165),
- normalization AFTER zero-padding (reference collate :247-251), so padding
  holds the normalized-zero value,
- items longer than max_text_len/max_mel_len are truncated and their lengths
  clamped,
- `DeviceCacheLoader` reuses `PackedLoader`'s exact batch ordering (same
  seed => same global batches) and its multi-host shard / resume contract.
"""

import mmap
from typing import Optional

import numpy as np

from ..config import DataStatistics
from ..utils.bucketing import round_up_to_bucket
from ..utils.pylogger import get_pylogger
from .packed import _HEADER, _ITEM, _MAGIC, PackedLoader

log = get_pylogger(__name__)


class PackedArena:
    """Pure-Python mmap reader of the .pak format (data/packed.py writer).

    Used to build the device arenas without requiring the native library,
    and to serve host-side raw-wav access when the wav arena is not cached
    on device."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        magic, version, n_items, n_feats, hop = _HEADER.unpack_from(self._mm, 0)
        if magic != _MAGIC:
            raise IOError(f"{path}: not a packed dataset (magic {magic!r})")
        self.n_items = int(n_items)
        self.n_feats = int(n_feats)
        self.hop_length = int(hop)
        self._items = [
            _ITEM.unpack_from(self._mm, _HEADER.size + i * _ITEM.size)
            for i in range(self.n_items)
        ]
        self.text_lens = np.array([it[5] for it in self._items], np.int32)
        self.wav_lens = np.array([it[6] for it in self._items], np.int32)
        self.mel_lens = np.array([it[7] for it in self._items], np.int32)
        self.sids = np.array([it[8] for it in self._items], np.int32)
        self.lids = np.array([it[9] for it in self._items], np.int32)

    def __len__(self):
        return self.n_items

    def _view(self, off: int, count: int, dtype) -> np.ndarray:
        return np.frombuffer(self._mm, dtype=dtype, count=count, offset=off)

    def text(self, i: int) -> np.ndarray:
        it = self._items[i]
        return self._view(it[0], it[5], np.int32)

    def wav(self, i: int) -> np.ndarray:
        it = self._items[i]
        return self._view(it[1], it[6], np.float32)

    def mel(self, i: int) -> np.ndarray:
        it = self._items[i]
        return self._view(it[2], self.n_feats * it[7], np.float32).reshape(
            self.n_feats, it[7]
        )

    def pitch(self, i: int) -> np.ndarray:
        it = self._items[i]
        return self._view(it[3], it[7], np.float32)

    def energy(self, i: int) -> np.ndarray:
        it = self._items[i]
        return self._view(it[4], it[7], np.float32)

    def close(self):
        self._mm.close()
        self._f.close()


class DeviceFeatureCache:
    """Padded, normalized feature arenas resident in device memory.

    `gather` is called INSIDE the jitted train step: it assembles a batch
    from (indices, segment starts) with a row gather + static slice, so the
    only per-step host->device traffic is those integer vectors."""

    def __init__(self, pak_path: str, statistics: DataStatistics,
                 f_min: float = 80.0, mesh=None, do_normalize: bool = True,
                 text_bucket: int = 32, mel_bucket: int = 128,
                 max_text_len: Optional[int] = None,
                 max_mel_len: Optional[int] = None,
                 mel_dtype: str = "float32", wav_dtype: str = "float32"):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        arena = PackedArena(pak_path)
        self.arena = arena
        self.n_items = arena.n_items
        self.n_feats = arena.n_feats
        self.hop_length = arena.hop_length
        # raw lengths drive the loader's length-grouped batch ordering
        # (identical to PackedDataset.text_lens/mel_lens)
        self.text_lens = arena.text_lens.copy()
        self.mel_lens = arena.mel_lens.copy()

        t_text = int(arena.text_lens.max())
        t_mel = int(arena.mel_lens.max())
        if max_text_len:
            t_text = min(t_text, max_text_len)
        if max_mel_len:
            t_mel = min(t_mel, max_mel_len)
        t_text = round_up_to_bucket(t_text, text_bucket)
        t_mel = round_up_to_bucket(t_mel, mel_bucket)
        self.t_text_max, self.t_mel_max = t_text, t_mel
        t_wav = t_mel * arena.hop_length

        n = arena.n_items
        x = np.zeros((n, t_text), np.int32)
        mel = np.zeros((n, arena.n_feats, t_mel), np.float32)
        pitch = np.zeros((n, t_mel), np.float32)
        energy = np.zeros((n, t_mel), np.float32)
        wav = np.zeros((n, t_wav), np.float32)
        for i in range(n):
            tl = min(int(arena.text_lens[i]), t_text)
            ml = min(int(arena.mel_lens[i]), t_mel)
            wl = min(int(arena.wav_lens[i]), t_wav)
            x[i, :tl] = arena.text(i)[:tl]
            mel[i, :, :ml] = arena.mel(i)[:, :ml]
            pitch[i, :ml] = arena.pitch(i)[:ml]
            energy[i, :ml] = arena.energy(i)[:ml]
            wav[i, :wl] = arena.wav(i)[:wl]
        # clip to [-1, 1] exactly like the reference collate
        # (datamodule.py:170, native/packed_dataset.cpp:170)
        np.clip(wav, -1.0, 1.0, out=wav)

        uv = float(f_min // 3.5)
        pitch[pitch <= uv] = 0.0
        if do_normalize:
            s = statistics
            mel = (mel - s.mel_mean) / s.mel_std
            pitch = (pitch - s.pitch_mean) / s.pitch_std
            energy = (energy - s.energy_mean) / s.energy_std

        if mel_dtype == "bfloat16":
            import ml_dtypes

            mel = mel.astype(ml_dtypes.bfloat16)
        self._wav_scale = None
        if wav_dtype == "int16":
            wav = np.clip(wav * 32767.0, -32768, 32767).astype(np.int16)
            self._wav_scale = 1.0 / 32767.0

        if mesh is not None:
            sharding = NamedSharding(mesh, P())  # fully replicated
            if jax.process_count() > 1:
                put = lambda a: jax.make_array_from_process_local_data(sharding, a)
            else:
                put = lambda a: jax.device_put(a, sharding)
        else:
            put = jax.device_put
        self.x = put(x)
        self.mel = put(mel)
        self.pitch = put(pitch)
        self.energy = put(energy)
        self.wav = put(wav)
        self.d_text_lens = put(np.minimum(arena.text_lens, t_text).astype(np.int32))
        self.d_mel_lens = put(np.minimum(arena.mel_lens, t_mel).astype(np.int32))
        has_sids = bool((arena.sids >= 0).all())
        has_lids = bool((arena.lids >= 0).all())
        self.d_sids = put(arena.sids) if has_sids else None
        self.d_lids = put(arena.lids) if has_lids else None
        nbytes = sum(a.nbytes for a in (x, mel, pitch, energy, wav))
        self.arena_bytes = nbytes
        # NO blocking sync here: the puts above are async and the upload
        # overlaps the (minutes-long) first train-step compile. Forcing a
        # D2H sync at this point was measured to wedge the tunneled
        # transport into a single ~GB-scale blocking window that its
        # watchdog kills after ~13 min (round-5 sweep trial 0, rc=-9).
        # Honest upload timing = time from process start to first train
        # step minus compile, or an explicit np.asarray fetch by the caller.
        hbm = ""
        try:  # HBM headroom after the upload (evidence for LJSpeech-scale runs)
            stats = jax.local_devices()[0].memory_stats() or {}
            if "bytes_in_use" in stats:
                hbm = (f"; HBM {stats['bytes_in_use'] / 1e9:.2f}"
                       + (f"/{stats['bytes_limit'] / 1e9:.2f}" if "bytes_limit" in stats else "")
                       + " GB in use")
        except Exception:
            pass
        log.info(
            f"Device feature cache: {n} items, arenas ({t_text} text, {t_mel} mel, "
            f"{t_wav} wav) = {nbytes / 1e9:.2f} GB enqueued to device{hbm}"
        )

    def arenas(self) -> dict:
        """The device-array pytree for the jitted step. MUST be passed as a
        jit ARGUMENT (training/step.py make_cached_train_step), never closed
        over: a traced function that closes over concrete arrays bakes them
        into the HLO as literal constants, and a 0.4+ GB constant blob
        overflows the harness's remote-compile transport (HTTP 413) and would
        bloat any compile cache."""
        d = dict(x=self.x, mel=self.mel, pitch=self.pitch, energy=self.energy,
                 wav=self.wav, text_lens=self.d_text_lens, mel_lens=self.d_mel_lens)
        if self.d_sids is not None:
            d["sids"] = self.d_sids
        if self.d_lids is not None:
            d["lids"] = self.d_lids
        return d

    def gather(self, idx, start_idx, t_text: int, t_mel: int, segment_size: int) -> dict:
        """Assemble a training batch on device (traced inside jit; prefer
        `gather_arenas` with `arenas()` passed as a jit argument)."""
        return gather_arenas(self.arenas(), idx, start_idx, t_text, t_mel,
                             segment_size, self.hop_length, self._wav_scale)


def gather_arenas(arenas: dict, idx, start_idx, t_text: int, t_mel: int,
                  segment_size: int, hop_length: int,
                  wav_scale: Optional[float] = None) -> dict:
    """Assemble a training batch on device from an arena pytree (traced
    inside jit; `arenas` comes in as a jit argument so the arrays are
    program PARAMETERS, not embedded constants).

    idx: (B,) int item indices; start_idx: (B,) segment starts in mel
    frames; t_text/t_mel: STATIC bucketed pad lengths for this batch;
    segment_size: static GAN segment length (mel frames)."""
    import jax.numpy as jnp

    seg = min(segment_size, t_mel)
    hop = hop_length
    x = jnp.take(arenas["x"], idx, axis=0)[:, :t_text]
    mel = jnp.take(arenas["mel"], idx, axis=0)[:, :, :t_mel]
    pitches = jnp.take(arenas["pitch"], idx, axis=0)[:, :t_mel]
    energies = jnp.take(arenas["energy"], idx, axis=0)[:, :t_mel]
    x_lengths = jnp.minimum(jnp.take(arenas["text_lens"], idx), t_text)
    mel_lengths = jnp.minimum(jnp.take(arenas["mel_lens"], idx), t_mel)
    # GT waveform segment: one flat gather, same clipped-index semantics
    # as ops/segments.host_slice_wav_segments
    wav = arenas["wav"]
    t_wav_full = wav.shape[1]
    pos = start_idx[:, None].astype(jnp.int32) * hop + jnp.arange(seg * hop, dtype=jnp.int32)[None, :]
    pos = jnp.clip(pos, 0, t_wav_full - 1)
    flat = idx[:, None].astype(jnp.int32) * t_wav_full + pos
    wav_seg = jnp.take(wav.reshape(-1), flat.reshape(-1)).reshape(pos.shape)
    if wav_scale is not None:
        wav_seg = wav_seg.astype(jnp.float32) * wav_scale
    return dict(
        x=x, x_lengths=x_lengths, mel=mel, mel_lengths=mel_lengths,
        pitches=pitches, energies=energies,
        sids=jnp.take(arenas["sids"], idx) if "sids" in arenas else None,
        lids=jnp.take(arenas["lids"], idx) if "lids" in arenas else None,
        start_idx=start_idx, wav_seg=wav_seg,
    )


class _LenTable:
    def __init__(self, text_lens, mel_lens):
        self.text_lens = text_lens
        self.mel_lens = mel_lens

    def __len__(self):
        return len(self.text_lens)


class DeviceCacheLoader(PackedLoader):
    """Light-batch loader over a DeviceFeatureCache.

    Inherits `PackedLoader`'s batch ordering (seed/epoch shuffle + length
    grouping), shard slicing, and `state_dict` resume contract verbatim, but
    yields only {idx, t_text, t_mel, mel_lengths} — the device does assembly.
    Multi-host: every process computes identical GLOBAL batches and yields
    its own index slice, and t_text/t_mel come from the global batch so all
    shards compile the same shapes."""

    def __init__(self, cache: DeviceFeatureCache, batch_size: int,
                 text_bucket: int, mel_bucket: int, **kwargs):
        super().__init__(_LenTable(cache.text_lens, cache.mel_lens), batch_size,
                         text_bucket, mel_bucket, **kwargs)
        self.cache = cache

    def __iter__(self):
        for bat in self._batch_indices()[self._pos:]:
            t_text = int(self.ds.text_lens[bat].max())
            t_mel = int(self.ds.mel_lens[bat].max())
            if self.max_text_len:
                t_text = min(t_text, self.max_text_len)
            if self.max_mel_len:
                t_mel = min(t_mel, self.max_mel_len)
            t_text = min(round_up_to_bucket(t_text, self.text_bucket),
                         self.cache.t_text_max)
            t_mel = min(round_up_to_bucket(t_mel, self.mel_bucket),
                        self.cache.t_mel_max)
            if self.num_shards > 1:
                local = self.batch_size // self.num_shards
                bat = bat[self.shard_id * local : (self.shard_id + 1) * local]
            self._pos += 1
            yield {
                "idx": np.ascontiguousarray(bat, np.int32),
                "t_text": t_text,
                "t_mel": t_mel,
                "mel_lengths": np.minimum(self.ds.mel_lens[bat], t_mel).astype(np.int32),
            }
        self.epoch += 1
        self._pos = 0
