"""Packed-dataset format: writer (Python) + mmap reader/collator (C++/ctypes).

The native loader (native/packed_dataset.cpp) replaces the per-utterance
.json/.npz host path for training: one arena file, mmapped, with parallel
C++ batch assembly (pad + normalize + uv-threshold) straight into numpy
buffers. `pack_dataset` converts a reference-format filelist into the packed
format. Falls back transparently to the Python BucketedCollate path when the
shared library can't be built.
"""

import ctypes
import json
import os
import struct
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from ..config import DataStatistics
from ..utils.bucketing import round_up_to_bucket
from ..utils.pylogger import get_pylogger

log = get_pylogger(__name__)

_MAGIC = b"OSPK"
_HEADER = struct.Struct("<4sIQII8x")  # magic, version, n_items, n_feats, hop, reserved
_ITEM = struct.Struct("<QQQQQIIIiiI")

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


class _CStats(ctypes.Structure):
    _fields_ = [
        ("mel_mean", ctypes.c_float), ("mel_std", ctypes.c_float),
        ("energy_mean", ctypes.c_float), ("energy_std", ctypes.c_float),
        ("pitch_mean", ctypes.c_float), ("pitch_std", ctypes.c_float),
        ("uv_threshold", ctypes.c_float),
    ]


def _build_native() -> Optional[ctypes.CDLL]:
    so = NATIVE_DIR / "libpacked_dataset.so"
    src = NATIVE_DIR / "packed_dataset.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.CalledProcessError) as e:
        log.warning(f"native packed_dataset unavailable ({e}); using Python fallback")
        return None
    lib.pd_open.restype = ctypes.c_void_p
    lib.pd_open.argtypes = [ctypes.c_char_p]
    lib.pd_close.argtypes = [ctypes.c_void_p]
    lib.pd_num_items.restype = ctypes.c_uint64
    lib.pd_num_items.argtypes = [ctypes.c_void_p]
    lib.pd_n_feats.restype = ctypes.c_uint32
    lib.pd_n_feats.argtypes = [ctypes.c_void_p]
    lib.pd_hop_length.restype = ctypes.c_uint32
    lib.pd_hop_length.argtypes = [ctypes.c_void_p]
    lib.pd_lengths.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pd_assemble_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(_CStats), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    return lib


_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _build_native()
        _LIB_TRIED = True
    return _LIB


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def pack_dataset(filelist_path: str, output_path: str, n_feats: int, hop_length: int):
    """Convert reference-format datafiles (json+npz per utterance) into one
    packed arena file."""
    from .datamodule import parse_filelist

    paths = parse_filelist(filelist_path)
    records, blobs = [], []
    offset = _HEADER.size + _ITEM.size * len(paths)
    for p in paths:
        base = Path(p)
        with open(base.with_suffix(".json"), encoding="utf-8") as f:
            meta = json.load(f)
        arrays = np.load(base.with_suffix(".npz"), allow_pickle=False)
        text = np.asarray(meta["phoneme_ids"], np.int32)
        wav = arrays["wav"].astype(np.float32)
        mel = np.ascontiguousarray(arrays["mel"].astype(np.float32))
        pitch = arrays["pitch"].astype(np.float32)
        energy = arrays["energy"].astype(np.float32)
        assert mel.shape[0] == n_feats, f"{base}: mel rows {mel.shape[0]} != {n_feats}"
        mel_len = mel.shape[1]
        assert pitch.shape[0] == mel_len and energy.shape[0] == mel_len

        offs = []
        for arr in (text, wav, mel, pitch, energy):
            offs.append(offset)
            blobs.append(arr.tobytes())
            offset += arr.nbytes
        records.append(_ITEM.pack(
            offs[0], offs[1], offs[2], offs[3], offs[4],
            len(text), len(wav), mel_len,
            int(meta.get("sid") if meta.get("sid") is not None else -1),
            int(meta.get("lid") if meta.get("lid") is not None else -1),
            0,
        ))

    with open(output_path, "wb") as f:
        f.write(_HEADER.pack(_MAGIC, 1, len(paths), n_feats, hop_length))
        for r in records:
            f.write(r)
        for b in blobs:
            f.write(b)
    log.info(f"Packed {len(paths)} utterances -> {output_path} ({offset / 1e6:.1f} MB)")
    return output_path


# ---------------------------------------------------------------------------
# Reader / loader
# ---------------------------------------------------------------------------

class PackedDataset:
    """Mmapped packed dataset with native batch assembly."""

    def __init__(self, path: str, statistics: DataStatistics, f_min: float = 80.0,
                 do_normalize: bool = True, n_threads: int = 8):
        self.lib = get_native_lib()
        if self.lib is None:
            raise RuntimeError("native packed_dataset library unavailable")
        self.handle = self.lib.pd_open(str(path).encode())
        if not self.handle:
            raise IOError(f"cannot open packed dataset {path}")
        self.n_items = int(self.lib.pd_num_items(self.handle))
        self.n_feats = int(self.lib.pd_n_feats(self.handle))
        self.hop_length = int(self.lib.pd_hop_length(self.handle))
        self.stats = _CStats(
            statistics.mel_mean, statistics.mel_std,
            statistics.energy_mean, statistics.energy_std,
            statistics.pitch_mean, statistics.pitch_std,
            float(f_min // 3.5),
        )
        self.do_normalize = do_normalize
        self.n_threads = n_threads
        # length table for grouping (one native call)
        idxs = np.arange(self.n_items, dtype=np.int64)
        lens = np.zeros((self.n_items, 2), np.int32)
        self.lib.pd_lengths(
            self.handle, idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.n_items, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        self.text_lens = lens[:, 0].copy()
        self.mel_lens = lens[:, 1].copy()

    def __len__(self):
        return self.n_items

    def __del__(self):
        if getattr(self, "handle", None) and getattr(self, "lib", None):
            self.lib.pd_close(self.handle)
            self.handle = None

    def assemble(self, indices: np.ndarray, text_bucket: int, mel_bucket: int,
                 max_text_len: Optional[int] = None, max_mel_len: Optional[int] = None,
                 t_text: Optional[int] = None, t_mel: Optional[int] = None) -> dict:
        """`t_text`/`t_mel` force the padded lengths (pre-rounding) — used by
        multi-host shards so every process pads to the global batch's max."""
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        t_text = t_text or int(self.text_lens[indices].max())
        t_mel = t_mel or int(self.mel_lens[indices].max())
        if max_text_len:
            t_text = min(t_text, max_text_len)
        if max_mel_len:
            t_mel = min(t_mel, max_mel_len)
        t_text = round_up_to_bucket(t_text, text_bucket)
        t_mel = round_up_to_bucket(t_mel, mel_bucket)
        t_wav = t_mel * self.hop_length

        x = np.empty((n, t_text), np.int32)
        wav = np.empty((n, t_wav), np.float32)
        mel = np.empty((n, self.n_feats, t_mel), np.float32)
        pitch = np.empty((n, t_mel), np.float32)
        energy = np.empty((n, t_mel), np.float32)
        xl = np.empty(n, np.int32)
        ml = np.empty(n, np.int32)
        wl = np.empty(n, np.int32)
        sids = np.empty(n, np.int32)
        lids = np.empty(n, np.int32)

        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))  # noqa: E731
        f32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa: E731
        self.lib.pd_assemble_batch(
            self.handle, indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            t_text, t_mel, ctypes.byref(self.stats), int(self.do_normalize),
            i32p(x), f32p(wav), f32p(mel), f32p(pitch), f32p(energy),
            i32p(xl), i32p(ml), i32p(wl), i32p(sids), i32p(lids), self.n_threads,
        )
        return dict(
            x=x, wav=wav, mel=mel, pitches=pitch, energies=energy,
            x_lengths=xl, mel_lengths=ml, wav_lengths=wl,
            sids=sids if (sids >= 0).all() else None,
            lids=lids if (lids >= 0).all() else None,
        )


class PackedLoader:
    """Length-grouped shuffled loader over a PackedDataset.

    Same multi-host and resume contract as datamodule.DataLoader: every
    process computes the identical global batch order and assembles only its
    `batch_size/num_shards` slice — padded to the GLOBAL batch's max lengths
    (cheap here: the length tables are cached) — and `state_dict()` captures
    (epoch, position) for step-deterministic resume."""

    def __init__(self, dataset: PackedDataset, batch_size: int, text_bucket: int,
                 mel_bucket: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, length_group_size: int = 8,
                 max_text_len: Optional[int] = None, max_mel_len: Optional[int] = None,
                 shard_id: int = 0, num_shards: int = 1):
        if batch_size % num_shards:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by "
                f"num_shards {num_shards}"
            )
        self.ds = dataset
        self.batch_size = batch_size
        self.text_bucket = text_bucket
        self.mel_bucket = mel_bucket
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.length_group_size = length_group_size
        self.max_text_len = max_text_len
        self.max_mel_len = max_mel_len
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0
        self._pos = 0

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "pos": self._pos, "seed": self.seed}

    def load_state_dict(self, state: dict):
        self.epoch = int(state["epoch"])
        self._pos = int(state["pos"])
        self.seed = int(state.get("seed", self.seed))

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(idx)
        group = self.batch_size * self.length_group_size
        batches = []
        for start in range(0, len(idx), group):
            chunk = idx[start : start + group]
            chunk = chunk[np.argsort(self.ds.mel_lens[chunk], kind="stable")]
            for b in range(0, len(chunk), self.batch_size):
                bat = chunk[b : b + self.batch_size]
                if len(bat) == self.batch_size or not self.drop_last:
                    if self.num_shards > 1 and len(bat) < self.batch_size:
                        # shards need equal non-empty slices: wrap the partial
                        # batch (same convention as datamodule.DataLoader)
                        bat = np.resize(bat, self.batch_size)
                    batches.append(bat)
        if self.shuffle:
            rng.shuffle(batches)
        return batches  # GLOBAL batches

    def __iter__(self):
        for bat in self._batch_indices()[self._pos :]:
            t_text = t_mel = None
            if self.num_shards > 1:
                t_text = int(self.ds.text_lens[bat].max())
                t_mel = int(self.ds.mel_lens[bat].max())
                local = self.batch_size // self.num_shards
                bat = bat[self.shard_id * local : (self.shard_id + 1) * local]
            self._pos += 1
            yield self.ds.assemble(bat, self.text_bucket, self.mel_bucket,
                                   self.max_text_len, self.max_mel_len,
                                   t_text=t_text, t_mel=t_mel)
        self.epoch += 1
        self._pos = 0
