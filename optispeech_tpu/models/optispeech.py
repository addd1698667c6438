"""Top-level model API (L4): prepare_input / synthesise / checkpoint restore.

Capability parity with OptiSpeech
(/root/reference/optispeech/model/optispeech.py): text -> InferenceInputs
with speaker/language resolution and d/p/e factor defaults; synthesise returns
InferenceOutputs with per-stage RTF/latency instrumentation
(reference generator/__init__.py:285-289).

TPU-first: inference is two jitted stages — token-rate `encode` (compiled per
text bucket) and frame-rate `decode` (compiled per (text, mel) bucket pair).
The host reads the predicted total duration between stages to pick the mel
bucket; that single scalar sync replaces torch's fully dynamic shapes.
Prosody factors are passed as device scalars so changing them never
recompiles.
"""

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig, InferenceArgs
from ..text import TextProcessor
from ..utils.bucketing import round_up_to_bucket
from ..values import InferenceInputs, InferenceOutputs
from .generator import OptiSpeechGenerator


class OptiSpeech:
    def __init__(
        self,
        cfg: ExperimentConfig,
        params=None,
        seed: int = 0,
        compute_dtype: jnp.dtype = jnp.float32,
        speakers: Optional[list[str]] = None,
    ):
        self.cfg = cfg
        self.inference_args: InferenceArgs = cfg.inference_args
        self.text_processor = TextProcessor.from_config(cfg.data.text_processor)
        self.num_speakers = cfg.generator.num_speakers
        self.speakers = speakers or []
        self.sample_rate = cfg.generator.features.sample_rate
        self.hop_length = cfg.generator.features.hop_length
        self.generator = OptiSpeechGenerator(cfg.generator, dtype=compute_dtype)
        self.text_bucket = cfg.data.text_bucket_size
        self.mel_bucket = cfg.data.mel_bucket_size

        if params is None:
            params = self.init_params(jax.random.PRNGKey(seed))
        self.params = params

        self._encode_jit = jax.jit(self._encode_fn)
        self._decode_jit = jax.jit(self._decode_fn, static_argnames=("n_frames",))
        self._fixed_jit = jax.jit(
            self._fixed_fn, static_argnames=("n_frames", "pcm16", "mulaw")
        )

    # ------------------------------------------------------------------
    def init_params(self, rng):
        c = self.cfg.generator
        t_text = self.text_bucket
        t_mel = self.mel_bucket
        dummy = dict(
            x=jnp.zeros((1, t_text), jnp.int32),
            x_lengths=jnp.full((1,), t_text, jnp.int32),
            mel=jnp.zeros((1, c.features.n_feats, t_mel), jnp.float32),
            mel_lengths=jnp.full((1,), t_mel, jnp.int32),
            pitches=jnp.zeros((1, t_mel), jnp.float32),
            energies=jnp.zeros((1, t_mel), jnp.float32),
        )
        variables = jax.jit(lambda k: self.generator.init(
            {"params": k, "dropout": k, "segment": k}, **dummy, deterministic=True
        ))(rng)
        return variables["params"]

    # ------------------------------------------------------------------
    def _encode_fn(self, params, x, x_lengths, sids, lids, d_factor, p_factor, e_factor):
        return self.generator.apply(
            {"params": params}, x, x_lengths, sids, lids,
            d_factor, p_factor, e_factor, method=OptiSpeechGenerator.encode,
        )

    def _decode_fn(self, params, hidden, durations, x_mask, y_lengths, n_frames,
                   pitch=None):
        return self.generator.apply(
            {"params": params}, hidden, durations, x_mask, y_lengths, n_frames,
            pitch=pitch, method=OptiSpeechGenerator.decode,
        )

    def _fixed_fn(self, params, x, x_lengths, sids, lids, d_factor, p_factor,
                  e_factor, n_frames, pcm16=False, mulaw=False):
        out = self.generator.apply(
            {"params": params}, x, x_lengths, sids, lids,
            d_factor, p_factor, e_factor, n_frames,
            method=OptiSpeechGenerator.synthesise_fixed,
        )
        if pcm16:
            # serve 16-bit PCM straight off the chip: halves the device->host
            # bytes (wav is already clipped to [-1, 1] by the vocoder head)
            out["wav_pcm16"] = jnp.round(out["wav"] * 32767.0).astype(jnp.int16)
        if mulaw:
            # 8-bit µ-law wire: quarter of the f32 bytes at ~38 dB SNR
            # (ops/mulaw.py); decode client-side with ops.mulaw.mulaw_decode.
            # The packed variant additionally compacts every row's valid
            # prefix to cumulative offsets so the fetch ships ONLY real
            # samples (the padded buffer is typically ~3x the valid audio)
            from ..ops.mulaw import mulaw_encode, pack_valid_rows

            codes = mulaw_encode(out["wav"])
            out["wav_mulaw"] = codes
            packed, offs = pack_valid_rows(codes, out["wav_lengths"])
            out["wav_mulaw_packed"] = packed
            out["wav_offsets"] = offs
        return out

    def fetch_packed(self, packed, n_valid: int, bucket: int = 65536):
        """Fetch the valid prefix of a packed on-device code buffer as numpy,
        slicing ON DEVICE first (one bucketed slice dispatch + one transfer
        instead of shipping the padding)."""
        n = min(-(-int(n_valid) // bucket) * bucket, packed.shape[0])
        return np.asarray(jax.lax.dynamic_slice_in_dim(packed, 0, n))[: int(n_valid)]

    def synthesise_on_device(self, inputs: InferenceInputs, n_frames: int,
                             pcm16: bool = False, mulaw: bool = False):
        """Single-graph synthesis with a static frame cap; returns DEVICE
        arrays without any host sync (callers fetch/stream as needed). This is
        the serving hot path; `synthesise` wraps the two-stage exact-bucket
        variant with host-side numpy outputs. `pcm16=True` adds a `wav_pcm16`
        int16 output computed on device; `mulaw=True` adds a `wav_mulaw`
        uint8 output — the serving wire formats."""
        inputs = inputs.as_numpy()
        b, t_text = inputs.x.shape
        t_bucket = round_up_to_bucket(t_text, self.text_bucket)
        x = np.zeros((b, t_bucket), np.int32)
        x[:, :t_text] = inputs.x
        sids = jnp.asarray(inputs.sids.astype(np.int32)) if inputs.sids is not None else None
        lids = jnp.asarray(inputs.lids.astype(np.int32)) if inputs.lids is not None else None
        return self._fixed_jit(
            self.params, jnp.asarray(x), jnp.asarray(inputs.x_lengths.astype(np.int32)),
            sids, lids, jnp.float32(inputs.d_factor), jnp.float32(inputs.p_factor),
            jnp.float32(inputs.e_factor), n_frames, pcm16, mulaw,
        )

    # ------------------------------------------------------------------
    def prepare_input(
        self,
        text: str,
        *,
        language: str | None = None,
        speaker: str | int | None = None,
        d_factor: float = None,
        p_factor: float = None,
        e_factor: float = None,
        split_sentences: bool = True,
    ) -> InferenceInputs:
        """(reference model/optispeech.py:83-154)."""
        languages = self.text_processor.languages
        if language is None:
            language = languages[0]
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
        else:
            sid = None
        if self.text_processor.is_multi_language:
            try:
                lid = languages.index(language)
            except (ValueError, IndexError):
                raise ValueError(
                    f"A language with the given name `{language}` was not found in language list"
                )
        else:
            lid = None

        input_ids, clean_text = self.text_processor(
            text, lang=language, split_sentences=split_sentences
        )
        if split_sentences:
            lengths = [len(phids) for phids in input_ids]
        else:
            lengths = [len(input_ids)]
            input_ids = [input_ids]

        sids = [sid] * len(input_ids) if sid is not None else None
        lids = [lid] * len(input_ids) if lid is not None else None
        return InferenceInputs.from_ids_and_lengths(
            ids=input_ids,
            lengths=lengths,
            clean_text=clean_text,
            sids=sids,
            lids=lids,
            d_factor=d_factor or self.inference_args.d_factor,
            p_factor=p_factor or self.inference_args.p_factor,
            e_factor=e_factor or self.inference_args.e_factor,
        )

    # ------------------------------------------------------------------
    def synthesise(self, inputs: InferenceInputs, max_frames: int | None = None) -> InferenceOutputs:
        """(reference model/optispeech.py:58-81 + generator synthesise timers)."""
        inputs = inputs.as_numpy()
        b, t_text = inputs.x.shape
        t_bucket = round_up_to_bucket(t_text, self.text_bucket)
        x = np.zeros((b, t_bucket), np.int32)
        x[:, :t_text] = inputs.x
        x = jnp.asarray(x)
        x_lengths = jnp.asarray(inputs.x_lengths.astype(np.int32))
        sids = jnp.asarray(inputs.sids.astype(np.int32)) if inputs.sids is not None else None
        lids = jnp.asarray(inputs.lids.astype(np.int32)) if inputs.lids is not None else None
        d = jnp.float32(inputs.d_factor)
        p = jnp.float32(inputs.p_factor)
        e = jnp.float32(inputs.e_factor)

        am_t0 = time.perf_counter()
        enc = self._encode_jit(self.params, x, x_lengths, sids, lids, d, p, e)
        y_lengths = np.asarray(enc["y_lengths"])  # host sync: picks the mel bucket
        n_frames = round_up_to_bucket(int(y_lengths.max()), self.mel_bucket)
        if max_frames is not None:
            n_frames = min(n_frames, max_frames)
            y_lengths = np.minimum(y_lengths, n_frames)
        am_infer = (time.perf_counter() - am_t0) * 1000

        v_t0 = time.perf_counter()
        dec = self._decode_jit(
            self.params, enc["hidden"], enc["durations"], enc["x_mask"],
            jnp.asarray(y_lengths.astype(np.int32)), n_frames,
            pitch=enc["pitch"] if self.cfg.generator.vocoder.f0_cond else None,
        )
        wav = np.asarray(dec["wav"])
        wav_lengths = np.asarray(dec["wav_lengths"])
        v_infer = (time.perf_counter() - v_t0) * 1000

        # RTF over the ACTUAL audio produced, not the bucket-padded buffer —
        # padding would understate RTF vs the reference's exact-length timing
        # (generator/__init__.py:285-289)
        wav_t = int(wav_lengths.max()) / (self.sample_rate * 1e-3)
        am_rtf = am_infer / wav_t
        v_rtf = v_infer / wav_t
        return InferenceOutputs(
            wav=wav,
            wav_lengths=wav_lengths,
            durations=np.asarray(enc["durations"]),
            pitch=np.asarray(enc["pitch"]),
            energy=np.asarray(enc["energy"]),
            latency=am_infer + v_infer,
            rtf=am_rtf + v_rtf,
            am_rtf=am_rtf,
            v_rtf=v_rtf,
        )

    # ------------------------------------------------------------------
    # checkpoint one-call restore (reference load_from_checkpoint capability)
    def save_checkpoint(self, path: str):
        from ..training.checkpoint import save_inference_checkpoint

        save_inference_checkpoint(path, self.cfg, self.params, speakers=self.speakers)

    @classmethod
    def load_from_checkpoint(cls, path: str, compute_dtype=jnp.float32,
                             fused: bool = False) -> "OptiSpeech":
        """`fused=True` routes ConvNeXt decoder/vocoder blocks through the
        whole-block Pallas kernel (the measured ~1.7x device win on the
        synthesis hot path; falls back to XLA off-TPU or at non-tileable
        lengths — see ops/pallas_convnext.py)."""
        import dataclasses

        from ..training.checkpoint import load_inference_checkpoint

        cfg, params, meta = load_inference_checkpoint(path)
        if fused:
            g = cfg.generator
            kw = {}
            if g.decoder.kind == "convnext":
                kw["decoder"] = dataclasses.replace(g.decoder, fused_pallas=True)
            kw["vocoder"] = dataclasses.replace(g.vocoder, fused_pallas=True)
            cfg = dataclasses.replace(cfg, generator=dataclasses.replace(g, **kw))
        return cls(cfg, params=params, compute_dtype=compute_dtype,
                   speakers=meta.get("speakers") or [])
