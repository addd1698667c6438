"""Model export + self-contained exported runtime.

Capability parity with the reference's ONNX story
(/root/reference/optispeech/onnx/export.py + infer.py): training-only modules
are stripped, the inference graph is serialized with an embedded `inference`
metadata blob (sample rate, inference args, text-processor config) so the
exported artifact is self-describing, and a minimal runtime reconstructs the
TextProcessor from that metadata alone.

TPU-native format: jax.export StableHLO functions (one token-rate `encode` per
text bucket, one frame-rate `decode` per (text, mel) bucket pair), plus the
f32 params tree. The artifact replays on any jax backend (TPU/CPU) without
the model code — the role onnxruntime plays for the reference.
"""

import json
import os
import pickle
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from ..config import ExperimentConfig, from_dict, to_dict
from ..utils.bucketing import round_up_to_bucket
from ..utils.pylogger import get_pylogger
from ..values import InferenceInputs, InferenceOutputs, numpy_pad_sequences

log = get_pylogger(__name__)

# Artifacts are exported for BOTH platforms so one .graphs file serves on a
# TPU chip and on CPU-only hosts (reference's ONNX artifact is likewise
# backend-portable, /root/reference/optispeech/onnx/export.py:20-154).
# Single-platform export bit the round-5 campaign: exporting under
# JAX_PLATFORMS=cpu produced a cpu-only artifact that raised
# "exported for ('cpu',) but used on ('tpu',)" the moment the serve stage
# loaded it on the chip. (It "worked" in round 4 only because the image's
# sitecustomize silently overrode the exporter's cpu pin — see CLAUDE.md.)
_EXPORT_PLATFORMS = ("cpu", "tpu")


def export_model(
    model,
    output_dir: str,
    text_buckets: Sequence[int] = (32, 64, 128),
    frames_per_token: int = 12,
    mel_buckets: Sequence[int] | None = None,
    batch_sizes: Sequence[int] = (1, 2, 4, 8),
    stream_chunk_frames: int | None = 256,
    stream_overlap: int = 48,
):
    """Serialize the two-stage inference graph for the given bucket ladders.

    `batch_sizes` exports a power-of-two BATCH ladder per text bucket so the
    serving batcher's coalescing works against artifacts exactly like against
    live checkpoints (the reference serves its deployable ONNX artifact as the
    primary runtime, onnx/infer.py:24-145; its dynamic-batch ONNX graphs are
    mirrored here by the static rung ladder). `stream_chunk_frames` also
    exports the chunked decode pipeline (upsample + windowed decoder+vocoder)
    used by `/stream`; None skips it."""
    from ..models.generator import OptiSpeechGenerator

    os.makedirs(output_dir, exist_ok=True)
    gen = model.generator
    params = jax.device_get(model.params)

    exports: dict[str, bytes] = {}
    mel_bucket_size = model.mel_bucket
    # multi-speaker/multi-language models get sids/lids as graph inputs,
    # mirroring the reference's conditional ONNX inputs
    # (/root/reference/optispeech/onnx/export.py:56-66)
    has_spk_inputs = (model.cfg.generator.num_speakers > 1
                      or model.cfg.generator.num_languages > 1)
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    for tb in text_buckets:
        mels = mel_buckets or [round_up_to_bucket(tb * frames_per_token, mel_bucket_size)]
        for nb in batch_sizes:
            if has_spk_inputs:
                def encode_fn(params, x, x_lengths, sids, lids, d, p, e):
                    return gen.apply({"params": params}, x, x_lengths, sids, lids, d, p, e,
                                     method=OptiSpeechGenerator.encode)

                id_inputs = (
                    jax.ShapeDtypeStruct((nb,), jnp.int32),  # sids
                    jax.ShapeDtypeStruct((nb,), jnp.int32),  # lids
                )
            else:
                def encode_fn(params, x, x_lengths, d, p, e):
                    return gen.apply({"params": params}, x, x_lengths, None, None, d, p, e,
                                     method=OptiSpeechGenerator.encode)

                id_inputs = ()

            args = (
                params,
                jax.ShapeDtypeStruct((nb, tb), jnp.int32),
                jax.ShapeDtypeStruct((nb,), jnp.int32),
                *id_inputs,
                jax.ShapeDtypeStruct((), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.float32),
            )
            # batch-1 keeps the round-2 key (`encode_{tb}`) so old runtimes
            # keep working; rungs >1 append the batch suffix
            ek = f"encode_{tb}" if nb == 1 else f"encode_{tb}_b{nb}"
            exports[ek] = jexport.export(
                jax.jit(encode_fn), platforms=_EXPORT_PLATFORMS)(*args).serialize()

            for mb in mels:
                if model.cfg.generator.vocoder.f0_cond:
                    def decode_fn(params, hidden, durations, x_mask, y_lengths, pitch):
                        return gen.apply({"params": params}, hidden, durations, x_mask,
                                         y_lengths, mb, pitch=pitch,
                                         method=OptiSpeechGenerator.decode)

                    f0_inputs = (jax.ShapeDtypeStruct((nb, tb), jnp.float32),)
                else:
                    def decode_fn(params, hidden, durations, x_mask, y_lengths):
                        return gen.apply({"params": params}, hidden, durations, x_mask,
                                         y_lengths, mb, method=OptiSpeechGenerator.decode)

                    f0_inputs = ()

                dargs = (
                    params,
                    jax.ShapeDtypeStruct((nb, tb, model.cfg.generator.dim), jnp.float32),
                    jax.ShapeDtypeStruct((nb, tb), jnp.int32),
                    jax.ShapeDtypeStruct((nb, tb), jnp.bool_),
                    jax.ShapeDtypeStruct((nb,), jnp.int32),
                    *f0_inputs,
                )
                dk = (f"decode_{tb}_{mb}" if nb == 1 else f"decode_{tb}_{mb}_b{nb}")
                exports[dk] = jexport.export(
                    jax.jit(decode_fn), platforms=_EXPORT_PLATFORMS)(*dargs).serialize()

    stream_meta = None
    if stream_chunk_frames:
        stream_meta = _export_stream_graphs(
            exports, model, text_buckets, frames_per_token,
            stream_chunk_frames, stream_overlap, has_spk_inputs,
        )

    with open(os.path.join(output_dir, "graphs.pkl"), "wb") as f:
        pickle.dump(exports, f)
    with open(os.path.join(output_dir, "params.pkl"), "wb") as f:
        pickle.dump(params, f)
    metadata = {
        "inference": {
            "name": model.cfg.run_name,
            "sample_rate": model.sample_rate,
            "hop_length": model.hop_length,
            "inference_args": {
                "d_factor": model.inference_args.d_factor,
                "p_factor": model.inference_args.p_factor,
                "e_factor": model.inference_args.e_factor,
            },
            "text_processor": model.text_processor.asdict(),
            "speakers": model.speakers,
            "num_speakers": model.cfg.generator.num_speakers,
            "num_languages": model.cfg.generator.num_languages,
            "has_speaker_inputs": has_spk_inputs,
            "f0_cond": model.cfg.generator.vocoder.f0_cond,
        },
        "buckets": sorted({
            int(k.split("_")[1]) for k in exports if k.startswith("encode")
        }),
        "batch_sizes": batch_sizes,
        "stream": stream_meta,
        "config": to_dict(model.cfg),
    }
    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    log.info(f"Exported {len(exports)} graphs -> {output_dir}")
    return output_dir


def _export_stream_graphs(exports, model, text_buckets, frames_per_token,
                          chunk_frames, overlap, has_spk_inputs):
    """Chunked-decode graphs: `stream_upsample_{tb}_{mb}` (encode + gaussian
    upsample to mb frames, batch 1) and `stream_decode_{W}` (decoder+vocoder
    over one W-frame window). Mirrors models/streaming.py's two jits so
    `/stream` replays from the frozen artifact."""
    from ..models.generator import OptiSpeechGenerator
    from ..ops import gaussian_upsample, sequence_mask

    gen = model.generator
    params = jax.device_get(model.params)
    dim = model.cfg.generator.dim
    mel_bucket_size = model.mel_bucket
    window = chunk_frames + 2 * overlap
    f0_cond = model.cfg.generator.vocoder.f0_cond

    for tb in text_buckets:
        mb = round_up_to_bucket(tb * frames_per_token, mel_bucket_size)

        def upsample_fn(params, x, x_lengths, sids, lids, d, p, e):
            enc = gen.apply({"params": params}, x, x_lengths, sids, lids, d, p, e,
                            method=OptiSpeechGenerator.encode)
            y_lengths = jnp.minimum(enc["y_lengths"], mb)
            y_mask = sequence_mask(y_lengths, mb)
            frames = gaussian_upsample(
                enc["hidden"], enc["durations"].astype(jnp.float32), y_mask,
                enc["x_mask"],
            )
            out = {"frames": frames, "y_lengths": y_lengths}
            if f0_cond:
                from ..ops import expand_by_duration

                f0, _ = expand_by_duration(enc["pitch"][..., None], enc["durations"], mb)
                out["f0_frames"] = f0[..., 0] * y_mask.astype(f0.dtype)
            return out

        if has_spk_inputs:
            fn = upsample_fn
            id_inputs = (
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            )
        else:
            fn = lambda params, x, x_lengths, d, p, e: upsample_fn(
                params, x, x_lengths, None, None, d, p, e)
            id_inputs = ()
        args = (
            params,
            jax.ShapeDtypeStruct((1, tb), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            *id_inputs,
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
        exports[f"stream_upsample_{tb}_{mb}"] = (
            jexport.export(jax.jit(fn), platforms=_EXPORT_PLATFORMS)(*args).serialize()
        )

    if f0_cond:
        def chunk_fn(params, window_frames, window_f0, window_padding_mask):
            return gen.apply(
                {"params": params}, window_frames, window_f0, window_padding_mask,
                method=lambda m, f, f0, pm:
                    m.vocoder(m.decoder(f, pm, deterministic=True),
                              f0=f0, padding_mask=pm, deterministic=True),
            )

        cargs = (
            params,
            jax.ShapeDtypeStruct((1, window, dim), jnp.float32),
            jax.ShapeDtypeStruct((1, window), jnp.float32),
            jax.ShapeDtypeStruct((1, window), jnp.bool_),
        )
    else:
        def chunk_fn(params, window_frames, window_padding_mask):
            return gen.apply(
                {"params": params}, window_frames, window_padding_mask,
                method=lambda m, f, pm:
                    m.vocoder(m.decoder(f, pm, deterministic=True),
                              padding_mask=pm, deterministic=True),
            )

        cargs = (
            params,
            jax.ShapeDtypeStruct((1, window, dim), jnp.float32),
            jax.ShapeDtypeStruct((1, window), jnp.bool_),
        )
    exports[f"stream_decode_{window}"] = jexport.export(
        jax.jit(chunk_fn), platforms=_EXPORT_PLATFORMS)(*cargs).serialize()
    return {"chunk_frames": chunk_frames, "overlap": overlap, "window": window,
            "f0_cond": f0_cond}


class ExportedOptiSpeech:
    """Minimal runtime over an exported artifact (reference
    OptiSpeechONNXModel, onnx/infer.py:24-145): text processing rebuilt from
    metadata, prepare_input/synthesise API, RTF/latency instrumentation."""

    def __init__(self, path: str):
        with open(os.path.join(path, "metadata.json")) as f:
            self.metadata = json.load(f)
        with open(os.path.join(path, "graphs.pkl"), "rb") as f:
            self._graphs = {k: jexport.deserialize(v) for k, v in pickle.load(f).items()}
        with open(os.path.join(path, "params.pkl"), "rb") as f:
            self.params = pickle.load(f)

        from ..text import TextProcessor

        inf = self.metadata["inference"]
        self.text_processor = TextProcessor.from_dict(inf["text_processor"])
        self.sample_rate = inf["sample_rate"]
        self.hop_length = inf["hop_length"]
        self.inference_args = inf["inference_args"]
        self.speakers = inf.get("speakers") or []
        self.num_speakers = inf.get("num_speakers", 1)
        self.num_languages = inf.get("num_languages", 1)
        self.has_speaker_inputs = inf.get("has_speaker_inputs", False)
        self.text_buckets = self.metadata["buckets"]
        # batch-rung ladder per text bucket: encode_{tb} is rung 1,
        # encode_{tb}_b{N} the wider rungs (round-2 artifacts only have rung 1)
        self._rungs: dict[int, list[int]] = {}
        for k in self._graphs:
            parts = k.split("_")
            if parts[0] != "encode":
                continue
            tb = int(parts[1])
            nb = int(parts[2][1:]) if len(parts) > 2 else 1
            self._rungs.setdefault(tb, []).append(nb)
        for tb in self._rungs:
            self._rungs[tb].sort()
        self.stream_meta = self.metadata.get("stream")

    def prepare_input(self, text: str, lang: str | None = None,
                      speaker: str | int | None = None,
                      split_sentences: bool = False,
                      d_factor: float | None = None,
                      p_factor: float | None = None,
                      e_factor: float | None = None) -> InferenceInputs:
        """(reference onnx/infer.py:57-107 incl. speaker/language resolution
        and d/p/e factor overrides)."""
        languages = self.text_processor.languages
        if lang is None:
            lang = languages[0]
        sid = None
        if self.num_speakers > 1:
            if speaker is None:
                sid = 0
            elif isinstance(speaker, str):
                try:
                    sid = self.speakers.index(speaker)
                except (ValueError, IndexError):
                    raise ValueError(
                        f"A speaker with the given name `{speaker}` was not found in speaker list"
                    )
            else:
                sid = int(speaker)
        lid = None
        if self.text_processor.is_multi_language:
            try:
                lid = languages.index(lang)
            except (ValueError, IndexError):
                raise ValueError(
                    f"A language with the given name `{lang}` was not found in language list"
                )

        input_ids, clean_text = self.text_processor(text, lang=lang, split_sentences=split_sentences)
        if split_sentences:
            lengths = [len(i) for i in input_ids]
        else:
            lengths = [len(input_ids)]
            input_ids = [input_ids]
        n = len(input_ids)
        return InferenceInputs.from_ids_and_lengths(
            ids=input_ids, lengths=lengths, clean_text=clean_text,
            sids=[sid] * n if sid is not None else None,
            lids=[lid] * n if lid is not None else None,
            d_factor=d_factor if d_factor is not None else self.inference_args["d_factor"],
            p_factor=p_factor if p_factor is not None else self.inference_args["p_factor"],
            e_factor=e_factor if e_factor is not None else self.inference_args["e_factor"],
        )

    def synthesise(self, inputs: InferenceInputs) -> InferenceOutputs:
        """Batched replay up the exported rung ladder: sentence rows pad to
        the smallest exported batch rung that fits (one encode + one decode
        dispatch per slab), so serving-batcher coalescing works against
        artifacts exactly like against live checkpoints. Round-2 artifacts
        (rung-1 graphs only) degrade to the per-row loop automatically."""
        inputs = inputs.as_numpy()
        n = inputs.x.shape[1]
        tb = next((b for b in self.text_buckets if b >= n), self.text_buckets[-1])
        x = numpy_pad_sequences(inputs.x[:, :tb], tb).astype(np.int32)
        n_rows = x.shape[0]
        rungs = self._rungs.get(tb, [1])

        wavs, wav_lens, durs = [], [], []
        t0 = time.perf_counter()
        row = 0
        while row < n_rows:
            count = min(n_rows - row, rungs[-1])
            nb = next(r for r in rungs if r >= count)
            w, wl, d = self._synthesise_slab(inputs, x, tb, row, count, nb)
            wavs += w
            wav_lens += wl
            durs += d
            row += count
        latency = (time.perf_counter() - t0) * 1000
        maxlen = max(w.shape[-1] for w in wavs)
        wav = np.stack([np.pad(w, (0, maxlen - len(w))) for w in wavs])
        wav_t = sum(wav_lens) / (self.sample_rate * 1e-3)
        return InferenceOutputs(
            wav=wav, wav_lengths=np.asarray(wav_lens), latency=latency,
            rtf=latency / max(wav_t, 1e-9),
            durations=numpy_pad_sequences(durs) if durs else None,
        )

    def _graph(self, kind: str, tb: int, nb: int, mb: int | None = None):
        base = f"{kind}_{tb}" if mb is None else f"{kind}_{tb}_{mb}"
        return self._graphs[base if nb == 1 else f"{base}_b{nb}"]

    def _decode_buckets(self, tb: int, nb: int) -> list[int]:
        suffix = "" if nb == 1 else f"_b{nb}"
        out = []
        for k in self._graphs:
            parts = k.split("_")
            if parts[0] == "decode" and int(parts[1]) == tb and k.endswith(suffix):
                if nb == 1 and len(parts) > 3:
                    continue  # a _b{N} variant, not the rung-1 graph
                out.append(int(parts[2]))
        return sorted(out)

    def _synthesise_slab(self, inputs, x, tb: int, row: int, count: int, nb: int):
        """One encode+decode dispatch over rows [row, row+count) padded up to
        batch rung `nb` (pad rows repeat the slab's first row)."""
        pick = list(range(row, row + count)) + [row] * (nb - count)
        xb = x[pick]
        x_lengths = np.minimum(
            np.asarray(inputs.x_lengths)[pick], tb).astype(np.int32)
        id_args = ()
        if self.has_speaker_inputs:
            sids = (np.asarray(inputs.sids)[pick] if inputs.sids is not None
                    else np.zeros(nb)).astype(np.int32)
            lids = (np.asarray(inputs.lids)[pick] if inputs.lids is not None
                    else np.zeros(nb)).astype(np.int32)
            id_args = (sids, lids)
        enc = self._graph("encode", tb, nb).call(
            self.params, xb, x_lengths, *id_args,
            np.float32(inputs.d_factor), np.float32(inputs.p_factor),
            np.float32(inputs.e_factor),
        )
        y_len = np.asarray(enc["y_lengths"])
        decs = self._decode_buckets(tb, nb)
        y_max = int(y_len[:count].max())
        mb = next((m for m in decs if m >= y_max), decs[-1])
        y_lengths = np.minimum(y_len, mb).astype(np.int32)
        f0_args = ((np.asarray(enc["pitch"]),)
                   if self.metadata["inference"].get("f0_cond") else ())
        dec = self._graph("decode", tb, nb, mb).call(
            self.params, enc["hidden"], enc["durations"], enc["x_mask"], y_lengths,
            *f0_args,
        )
        wav = np.asarray(dec["wav"])
        wav_lengths = np.asarray(dec["wav_lengths"])
        durations = np.asarray(enc["durations"])
        return (
            [wav[i] for i in range(count)],
            [int(wav_lengths[i]) for i in range(count)],
            [durations[i] for i in range(count)],
        )


class ExportedStreamingSynthesiser:
    """Chunked synthesis replayed from a frozen artifact's stream graphs —
    the artifact-side counterpart of models/streaming.py (same API, so
    cli/serve.py's `/stream` endpoint works from exported artifacts too).
    Requires an artifact exported with `stream_chunk_frames` (round-3+)."""

    def __init__(self, exported: "ExportedOptiSpeech"):
        if not exported.stream_meta:
            raise ValueError(
                "artifact has no stream graphs; re-export with "
                "export_model(..., stream_chunk_frames=256)"
            )
        self.m = exported
        meta = exported.stream_meta
        self.chunk = meta["chunk_frames"]
        self.overlap = meta["overlap"]
        self.window = meta["window"]
        self.hop = exported.hop_length
        # stream_upsample_{tb}_{mb}
        self._ups: dict[int, tuple[int, object]] = {}
        for k, g in exported._graphs.items():
            parts = k.split("_")
            if parts[0] == "stream" and parts[1] == "upsample":
                self._ups[int(parts[2])] = (int(parts[3]), g)
        self._decode = exported._graphs[f"stream_decode_{self.window}"]

    def stream(self, inputs, max_frames: int | None = None):
        """Yield waveform chunks (numpy) for the first batch item."""
        inputs = inputs.as_numpy()
        t_text = inputs.x.shape[1]
        tbs = sorted(self._ups)
        tb = next((b for b in tbs if b >= t_text), tbs[-1])
        mb, ups = self._ups[tb]
        x = np.zeros((1, tb), np.int32)
        x[0, :min(t_text, tb)] = inputs.x[0, :tb]
        id_args = ()
        if self.m.has_speaker_inputs:
            sid = int(inputs.sids[0]) if inputs.sids is not None else 0
            lid = int(inputs.lids[0]) if inputs.lids is not None else 0
            id_args = (np.asarray([sid], np.int32), np.asarray([lid], np.int32))
        out = ups.call(
            self.m.params, x,
            np.asarray([min(int(inputs.x_lengths[0]), tb)], np.int32),
            *id_args,
            np.float32(inputs.d_factor), np.float32(inputs.p_factor),
            np.float32(inputs.e_factor),
        )
        frames = np.asarray(out["frames"])
        total = int(np.asarray(out["y_lengths"])[0])
        if max_frames is not None:
            total = min(total, max_frames)

        f0_cond = self.m.stream_meta.get("f0_cond", False)
        dim = frames.shape[-1]
        frames = np.concatenate([
            np.zeros((1, self.overlap, dim), frames.dtype),
            frames,
            np.zeros((1, self.window, dim), frames.dtype),
        ], axis=1)
        if f0_cond:
            f0 = np.asarray(out["f0_frames"])
            f0 = np.concatenate([
                np.zeros((1, self.overlap), f0.dtype), f0,
                np.zeros((1, self.window), f0.dtype),
            ], axis=1)
        pos0 = np.arange(self.window)
        start = 0
        while start < total:
            emit = min(self.chunk, total - start)
            window = frames[:, start : start + self.window]
            pos = pos0 + (start - self.overlap)
            pad_mask = ((pos < 0) | (pos >= total))[None, :]
            dargs = ((window, f0[:, start : start + self.window]) if f0_cond
                     else (window,))
            wav = np.asarray(self._decode.call(self.m.params, *dargs, pad_mask))
            s = self.overlap * self.hop
            yield wav[0, s : s + emit * self.hop]
            start += emit
