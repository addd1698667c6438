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


def export_model(
    model,
    output_dir: str,
    text_buckets: Sequence[int] = (32, 64, 128),
    frames_per_token: int = 12,
    mel_buckets: Sequence[int] | None = None,
):
    """Serialize the two-stage inference graph for the given bucket ladder."""
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
    for tb in text_buckets:
        if has_spk_inputs:
            def encode_fn(params, x, x_lengths, sids, lids, d, p, e):
                return gen.apply({"params": params}, x, x_lengths, sids, lids, d, p, e,
                                 method=OptiSpeechGenerator.encode)

            id_inputs = (
                jax.ShapeDtypeStruct((1,), jnp.int32),  # sids
                jax.ShapeDtypeStruct((1,), jnp.int32),  # lids
            )
        else:
            def encode_fn(params, x, x_lengths, d, p, e):
                return gen.apply({"params": params}, x, x_lengths, None, None, d, p, e,
                                 method=OptiSpeechGenerator.encode)

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
        exports[f"encode_{tb}"] = jexport.export(jax.jit(encode_fn))(*args).serialize()

        mels = mel_buckets or [round_up_to_bucket(tb * frames_per_token, mel_bucket_size)]
        for mb in mels:
            def decode_fn(params, hidden, durations, x_mask, y_lengths):
                return gen.apply({"params": params}, hidden, durations, x_mask,
                                 y_lengths, mb, method=OptiSpeechGenerator.decode)

            dargs = (
                params,
                jax.ShapeDtypeStruct((1, tb, model.cfg.generator.dim), jnp.float32),
                jax.ShapeDtypeStruct((1, tb), jnp.int32),
                jax.ShapeDtypeStruct((1, tb), jnp.bool_),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            )
            exports[f"decode_{tb}_{mb}"] = jexport.export(jax.jit(decode_fn))(*dargs).serialize()

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
        },
        "buckets": sorted({int(k.split("_")[1]) for k in exports if k.startswith("encode")}),
        "config": to_dict(model.cfg),
    }
    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    log.info(f"Exported {len(exports)} graphs -> {output_dir}")
    return output_dir


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
        inputs = inputs.as_numpy()
        n = inputs.x.shape[1]
        tb = next((b for b in self.text_buckets if b >= n), self.text_buckets[-1])
        x = numpy_pad_sequences(inputs.x[:, :tb], tb).astype(np.int32)

        wavs, wav_lens, durs = [], [], []
        t0 = time.perf_counter()
        # Batch strategy: exported graphs are batch-1 and multi-sentence input
        # replays them in a loop (same as the reference ONNX runtime's default
        # usage); large-batch serving should use the live model's bucketed
        # `synthesise` instead.
        for i in range(x.shape[0]):
            id_args = ()
            if self.has_speaker_inputs:
                sid = int(inputs.sids[i]) if inputs.sids is not None else 0
                lid = int(inputs.lids[i]) if inputs.lids is not None else 0
                id_args = (np.asarray([sid], np.int32), np.asarray([lid], np.int32))
            enc = self._graphs[f"encode_{tb}"].call(
                self.params, x[i : i + 1],
                np.asarray([min(int(inputs.x_lengths[i]), tb)], np.int32),
                *id_args,
                np.float32(inputs.d_factor), np.float32(inputs.p_factor),
                np.float32(inputs.e_factor),
            )
            y_len = int(np.asarray(enc["y_lengths"])[0])
            decs = sorted(
                int(k.split("_")[2]) for k in self._graphs if k.startswith(f"decode_{tb}_")
            )
            mb = next((m for m in decs if m >= y_len), decs[-1])
            y_lengths = np.asarray([min(y_len, mb)], np.int32)
            dec = self._graphs[f"decode_{tb}_{mb}"].call(
                self.params, enc["hidden"], enc["durations"], enc["x_mask"], y_lengths
            )
            wavs.append(np.asarray(dec["wav"])[0])
            wav_lens.append(int(np.asarray(dec["wav_lengths"])[0]))
            durs.append(np.asarray(enc["durations"])[0])
        latency = (time.perf_counter() - t0) * 1000
        maxlen = max(w.shape[-1] for w in wavs)
        wav = np.stack([np.pad(w, (0, maxlen - len(w))) for w in wavs])
        wav_t = sum(wav_lens) / (self.sample_rate * 1e-3)
        return InferenceOutputs(
            wav=wav, wav_lengths=np.asarray(wav_lens), latency=latency,
            rtf=latency / max(wav_t, 1e-9),
            durations=numpy_pad_sequences(durs) if durs else None,
        )
