"""HTTP serving runtime with request micro-batching.

No reference analogue (the reference's only server is the gradio demo,
/root/reference/scripts/gradio_ui.py) — this is the production serving path
the TPU design targets: concurrent HTTP requests coalesce into ONE device
dispatch of the fixed-shape synthesis graph (batch padded up a power-of-two
ladder, int16 PCM computed on device, adaptive frame cap), then split back
per request. See docs/serving.md and docs/evidence/serving_load.md.

Endpoints:
    GET  /health             -> {"status": "ok", ...counters}
    GET  /info               -> model metadata (sample rate, speakers, ...)
    POST /synthesise         JSON body:
        {"text": "...", "speaker": null, "language": null,
         "d_factor": null, "p_factor": null, "e_factor": null,
         "format": "wav" | "pcm16" | "mulaw" | "json"}
      -> audio/wav bytes (WAV), raw int16 PCM (+ X-Sample-Rate header), raw
         8-bit µ-law codes (X-Encoding: mulaw; decode with
         ops.mulaw.mulaw_decode — quarter of the f32 wire bytes, computed on
         device when the whole batch asked for µ-law), or
         JSON {"sample_rate", "pcm16_b64", "latency_ms"}.
    POST /stream             same body (no "format") -> chunked-transfer raw
      int16 PCM: audio starts flowing while later frames are still being
      decoded (models/streaming.py chunked pipeline; time-to-first-audio is
      one chunk, not the whole utterance). Works for live checkpoints AND
      artifacts exported with stream graphs; stream-graph-less (round-2)
      artifacts answer 501.

Batching contract: d/p/e factors are whole-batch scalars in the compiled
graph, so only requests with identical (d, p, e) coalesce; speaker/language
ids are per-row and batch freely. One batcher thread owns all device calls.

Usage:
    optispeech-tpu-serve CHECKPOINT_OR_ARTIFACT [--host 0.0.0.0 --port 8000]
        [--max-batch 32 --batch-wait-ms 20] [--bf16]
"""

import argparse
import base64
import io
import json
import os
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def load_model(path: str, bf16: bool = False, fused: bool = True):
    """Accepts either a live inference checkpoint (config.json) or an
    exported StableHLO artifact (metadata.json). Live checkpoints default to
    the fused-Pallas ConvNeXt serving path (the measured ~1.7x device win;
    self-gating off-TPU). Artifacts replay their pre-compiled graphs — fused
    is a trace-time choice there, and portable artifacts stay pure-XLA so
    they replay on any backend (docs/serving.md)."""
    if os.path.exists(os.path.join(path, "metadata.json")):
        from ..export.exporter import ExportedOptiSpeech

        return ExportedOptiSpeech(path)
    import jax.numpy as jnp

    from ..models.optispeech import OptiSpeech

    return OptiSpeech.load_from_checkpoint(
        path, compute_dtype=jnp.bfloat16 if bf16 else jnp.float32, fused=fused
    )


class _Pending:
    __slots__ = ("inputs", "event", "pcm16", "mulaw", "wants_mulaw",
                 "sample_rate", "latency_ms", "error", "truncated")

    def __init__(self, inputs, wants_mulaw: bool = False):
        self.inputs = inputs  # InferenceInputs (rows = sentences)
        self.event = threading.Event()
        self.pcm16 = None  # little-endian int16 waveform
        self.mulaw = None  # uint8 µ-law codes (when the batch used the 8-bit wire)
        self.wants_mulaw = wants_mulaw
        self.sample_rate = None
        self.latency_ms = None
        self.error = None
        self.truncated = False  # frame cap saturated: audio may be incomplete


class Batcher:
    """Single owner of the device: coalesces pending requests into batched
    synthesise calls. Requests sharing (d, p, e) merge into one batch of up
    to `max_batch` sentence rows; a new arrival waits at most `wait_ms` for
    co-batchees once the batcher is idle."""

    def __init__(self, model, max_batch: int = 32, wait_ms: float = 20.0,
                 frames_per_token: int = 8, max_pending: int = 256):
        self.model = model
        self.max_batch = max_batch
        self.wait_ms = wait_ms
        self.frames_per_token = frames_per_token
        # adaptive frame cap: start at frames_per_token, then track the
        # observed frames/token ratio so the fixed-shape graph (and its
        # device->host transfer) stops over-allocating. 25% headroom; an
        # underestimate just retries with a doubled cap. A bounded window
        # (not a monotonic max) so one long-duration outlier stops inflating
        # every later batch once it ages out.
        self._fpt_window: deque = deque(maxlen=64)
        # backpressure: bound total queued+deferred work; overflow -> 429
        self.max_pending = max_pending
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self.requests_rejected = 0
        self.q: "queue.Queue[_Pending]" = queue.Queue()
        self._deferred: list = []  # factor-incompatible requests, oldest first
        self.requests_served = 0
        self.batches_run = 0
        self.rows_synthesised = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, pending: _Pending) -> bool:
        """False = at capacity (caller should answer 429)."""
        with self._inflight_lock:
            if self._inflight >= self.max_pending:
                self.requests_rejected += 1
                return False
            self._inflight += 1
        self.q.put(pending)
        return True

    # -- internals ------------------------------------------------------
    @staticmethod
    def _factor_key(inp):
        return (round(float(inp.d_factor), 4), round(float(inp.p_factor), 4),
                round(float(inp.e_factor), 4))

    def _drain_compatible(self, first: _Pending):
        """Collect requests with `first`'s factor key up to max_batch rows.
        Incompatible arrivals go to `_deferred`, which the loop serves FIRST
        on its next cycle — a minority-factor request therefore waits at most
        one batch, it is never starved by a sustained majority-key stream."""
        group = [first]
        rows = first.inputs.x.shape[0]
        key = self._factor_key(first.inputs)
        # absorb already-deferred requests that match this key
        still_deferred = []
        for d in self._deferred:
            n = d.inputs.x.shape[0]
            if self._factor_key(d.inputs) == key and rows + n <= self.max_batch:
                group.append(d)
                rows += n
            else:
                still_deferred.append(d)
        self._deferred = still_deferred
        deadline = time.perf_counter() + self.wait_ms / 1e3
        while rows < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self.q.get(timeout=timeout)
            except queue.Empty:
                break
            n = nxt.inputs.x.shape[0]
            if self._factor_key(nxt.inputs) == key and rows + n <= self.max_batch:
                group.append(nxt)
                rows += n
            else:
                self._deferred.append(nxt)
        return group

    def _merge(self, group):
        """Concatenate the requests' sentence rows into one InferenceInputs,
        padded up the batch ladder.

        The batch dim is bucketed to powers of two (XLA compiles one program
        per shape; without the ladder every distinct coalesced request count
        would trigger a fresh multi-minute jit — a compile storm under mixed
        load). Pad rows repeat row 0 and are dropped after synthesis."""
        from ..values import InferenceInputs

        t = max(p.inputs.x.shape[1] for p in group)
        x = np.concatenate([
            np.pad(p.inputs.x, ((0, 0), (0, t - p.inputs.x.shape[1])))
            for p in group
        ])
        x_lengths = np.concatenate([p.inputs.x_lengths for p in group])
        has_sids = group[0].inputs.sids is not None
        has_lids = group[0].inputs.lids is not None
        sids = np.concatenate(
            [np.asarray(p.inputs.sids) for p in group]) if has_sids else None
        lids = np.concatenate(
            [np.asarray(p.inputs.lids) for p in group]) if has_lids else None

        n_real = x.shape[0]
        target = 1
        while target < n_real:
            target *= 2
        if target > n_real:
            reps = np.zeros(target - n_real, np.int64)  # repeat row 0
            x = np.concatenate([x, x[reps]])
            x_lengths = np.concatenate([x_lengths, x_lengths[reps]])
            if sids is not None:
                sids = np.concatenate([sids, sids[reps]])
            if lids is not None:
                lids = np.concatenate([lids, lids[reps]])

        f = group[0].inputs
        return InferenceInputs(
            x=x, x_lengths=x_lengths, sids=sids, lids=lids,
            d_factor=f.d_factor, p_factor=f.p_factor, e_factor=f.e_factor,
            clean_text=" | ".join(str(p.inputs.clean_text) for p in group),
        ), n_real

    def _synthesise_batch(self, merged, wire: str = "pcm16"):
        """Returns (audio rows in `wire` format, per-row sample lengths,
        truncated mask, latency_ms). `wire` is "pcm16" (int16) or "mulaw"
        (uint8, quarter of the f32 device->host bytes).

        Live checkpoints go through `synthesise_on_device(pcm16=True)`: ONE
        dispatch, no mid-graph host sync, int16 fetched straight off the
        chip — on the tunneled harness this cuts per-batch wall ~3x vs the
        two-stage path (the mid-sync for y_lengths and the f32 wav D2H
        dominate there; see docs/evidence/serving_load.md). The frame cap is
        `frames_per_token * max_text_len` rounded to the mel bucket; if any
        row saturates it, the cap doubles and the batch re-runs (rare — the
        retry reuses the ladder of compiled shapes).
        Exported artifacts fall back to the generic `synthesise`."""
        t0 = time.perf_counter()
        if hasattr(self.model, "synthesise_on_device"):
            from ..utils.bucketing import round_up_pow2_bucket

            hop = self.model.hop_length
            bucket = self.model.mel_bucket
            cap = getattr(getattr(self.model, "cfg", None), "data", None)
            cap = getattr(cap, "max_mel_len", None) or 4096
            t = int(np.asarray(merged.x_lengths).max())
            # the observed ratio may exceed the initial frames_per_token
            # guess — let the estimate grow, or every batch would pay the
            # cap-doubling retry forever. Tracked per unit d_factor so a
            # d=2.0 batch doesn't permanently inflate default-rate batches.
            d = float(merged.d_factor) or 1.0
            fpt = self.frames_per_token if not self._fpt_window \
                else max(self._fpt_window) * 1.25 * d
            # frames quantize to a power-of-two ladder, like the batch dim:
            # a linear-bucketed frame count tracks the drifting fpt estimate
            # through dozens of distinct shapes, and every new
            # (rows, frames) shape is a fresh multi-minute compile
            # (measured: 35-76 s p95 outliers under mixed load)
            n_frames = round_up_pow2_bucket(int(t * fpt), bucket, cap)
            while True:
                out = self.model.synthesise_on_device(
                    merged, n_frames, pcm16=(wire == "pcm16"),
                    mulaw=(wire == "mulaw"))
                wav_lengths = np.asarray(out["wav_lengths"])
                if (wav_lengths < n_frames * hop).all() or n_frames >= cap:
                    break
                n_frames = min(n_frames * 2, cap)
            # rows still filling the cap after the retry loop exits are
            # truncated — surface it instead of silently shipping a cut wav
            truncated = wav_lengths >= n_frames * hop
            if truncated.any():
                log.warning(
                    f"frame cap saturated at {n_frames} frames "
                    f"(cap {cap}): {int(truncated.sum())}/{len(truncated)} "
                    f"rows truncated"
                )
            lens = np.asarray(merged.x_lengths, dtype=float)
            ratio = float((wav_lengths / hop / np.maximum(lens, 1)).max()) / d
            self._fpt_window.append(ratio)
            wav_lengths = wav_lengths.astype(int)
            if wire == "mulaw" and "wav_mulaw_packed" in out:
                # packed fetch: only the valid samples cross the link (the
                # padded buffer is typically ~3x the real audio)
                flat = self.model.fetch_packed(
                    out["wav_mulaw_packed"], int(wav_lengths.sum()))
                offs = np.concatenate([[0], np.cumsum(wav_lengths)[:-1]])
                rows = [flat[offs[j] : offs[j] + wav_lengths[j]]
                        for j in range(len(wav_lengths))]
            else:
                audio = np.asarray(
                    out["wav_mulaw" if wire == "mulaw" else "wav_pcm16"])
                rows = [audio[j, : wav_lengths[j]] for j in range(len(wav_lengths))]
        else:
            out = self.model.synthesise(merged)
            wav_lengths = np.asarray(out.wav_lengths).astype(int)
            truncated = np.zeros(len(wav_lengths), bool)
            if wire == "mulaw":
                from ..ops.mulaw import mulaw_encode_np

                audio = mulaw_encode_np(np.asarray(out.wav))
            else:
                audio = (np.clip(np.asarray(out.wav), -1, 1) * 32767.0).astype("<i2")
            rows = [audio[j, : wav_lengths[j]] for j in range(len(wav_lengths))]
        return rows, wav_lengths, truncated, (time.perf_counter() - t0) * 1e3

    def _loop(self):
        while True:
            first = self._deferred.pop(0) if self._deferred else self.q.get()
            group = self._drain_compatible(first)
            try:
                merged, n_real = self._merge(group)
                # use the 8-bit µ-law wire only when EVERY request in the
                # batch asked for it (mixed batches fetch pcm16 and the
                # handler transcodes host-side for the µ-law requesters)
                wire = "mulaw" if all(p.wants_mulaw for p in group) else "pcm16"
                rows, wav_lengths, truncated, latency_ms = self._synthesise_batch(
                    merged, wire=wire)
                i = 0
                for p in group:
                    n = p.inputs.x.shape[0]
                    joined = np.concatenate(rows[i : i + n])
                    if wire == "mulaw":
                        p.mulaw = joined
                    else:
                        p.pcm16 = joined
                    p.sample_rate = self.model.sample_rate
                    p.latency_ms = latency_ms
                    p.truncated = bool(truncated[i : i + n].any())
                    i += n
                self.batches_run += 1
                self.rows_synthesised += n_real
                self.requests_served += len(group)
            except Exception as e:  # surface per-request, keep serving
                log.exception("batch failed")
                for p in group:
                    p.error = str(e)
            finally:
                with self._inflight_lock:
                    self._inflight -= len(group)
                for p in group:
                    p.event.set()


def _wav_bytes(pcm16: np.ndarray, sr: int) -> bytes:
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sr, np.ascontiguousarray(pcm16, np.int16))
    return buf.getvalue()


def make_handler(model, batcher: Batcher, timeout_s: float = 300.0,
                 stream_chunk_frames: int = 256, stream_overlap: int | None = None):
    streamer_box: list = []  # lazily-built StreamingSynthesiser
    streamer_lock = threading.Lock()

    def get_streamer():
        with streamer_lock:
            if not streamer_box:
                if hasattr(model, "generator"):
                    from ..models.streaming import DEFAULT_OVERLAP, StreamingSynthesiser

                    streamer_box.append(StreamingSynthesiser(
                        model, chunk_frames=stream_chunk_frames,
                        overlap=DEFAULT_OVERLAP if stream_overlap is None else stream_overlap,
                    ))
                elif getattr(model, "stream_meta", None):
                    # artifact exported with stream graphs (round-3+)
                    from ..export.exporter import ExportedStreamingSynthesiser

                    streamer_box.append(ExportedStreamingSynthesiser(model))
                else:
                    return None  # round-2 artifact without stream graphs
        return streamer_box[0]

    return _make_handler_cls(model, batcher, timeout_s, get_streamer)


def _make_handler_cls(model, batcher, timeout_s, get_streamer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through our logger
            log.debug("%s " + fmt, self.address_string(), *args)

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {
                    "status": "ok",
                    "requests_served": batcher.requests_served,
                    "batches_run": batcher.batches_run,
                    "rows_synthesised": batcher.rows_synthesised,
                    "requests_rejected": batcher.requests_rejected,
                })
            elif self.path == "/info":
                self._json(200, {
                    "sample_rate": model.sample_rate,
                    "speakers": getattr(model, "speakers", None) or [],
                    "num_speakers": getattr(model, "num_speakers", 1),
                    "languages": list(getattr(model.text_processor, "languages", [])),
                    "max_batch": batcher.max_batch,
                    "batch_wait_ms": batcher.wait_ms,
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path not in ("/synthesise", "/synthesize", "/stream"):
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            if self.path == "/stream" and get_streamer() is None:
                self._json(501, {"error": "this artifact has no stream graphs; "
                                          "re-export with stream_chunk_frames set"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                text = req.get("text", "").strip()
                if not text:
                    self._json(400, {"error": "missing `text`"})
                    return
                inputs = model.prepare_input(
                    text,
                    **({"speaker": req.get("speaker")}
                       if getattr(model, "num_speakers", 1) > 1 else {}),
                    **_lang_kw(model, req.get("language")),
                    d_factor=req.get("d_factor"),
                    p_factor=req.get("p_factor"),
                    e_factor=req.get("e_factor"),
                    split_sentences=True,
                )
            except (ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # e.g. tokenizer backend missing
                log.exception("prepare_input failed")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return

            if self.path == "/stream":
                self._stream(inputs.as_numpy(), fmt=req.get("format", "pcm16"))
                return

            fmt_early = req.get("format", "wav")
            pending = _Pending(inputs.as_numpy(), wants_mulaw=fmt_early == "mulaw")
            if not batcher.submit(pending):
                self.send_response(429)
                body = json.dumps({"error": "server at capacity; retry later"}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if not pending.event.wait(timeout_s):
                self._json(503, {"error": "synthesis timed out"})
                return
            if pending.error is not None:
                self._json(500, {"error": pending.error})
                return

            fmt = req.get("format", "wav")
            self._respond_audio(fmt, pending)

        def _stream(self, inputs, fmt: str = "pcm16"):
            """Chunked-transfer raw audio: one HTTP chunk per decoded window.
            `fmt` "pcm16" (default) or "mulaw" (8-bit; live models encode the
            chunk ON DEVICE so the wire is quarter of the f32 bytes — see
            models/streaming.py `wire`; exported artifacts transcode on host).
            Each sentence row streams in sequence (jax dispatch is
            thread-safe, so this interleaves with batcher traffic)."""
            import inspect

            from ..values import InferenceInputs

            streamer = get_streamer()
            mulaw = fmt == "mulaw"
            device_wire = mulaw and "wire" in inspect.signature(
                streamer.stream).parameters
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Sample-Rate", str(model.sample_rate))
            if mulaw:
                self.send_header("X-Encoding", "mulaw")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(b: bytes):
                self.wfile.write(f"{len(b):x}\r\n".encode() + b + b"\r\n")

            try:
                for i in range(inputs.x.shape[0]):
                    row = InferenceInputs(
                        x=inputs.x[i : i + 1],
                        x_lengths=inputs.x_lengths[i : i + 1],
                        sids=None if inputs.sids is None else inputs.sids[i : i + 1],
                        lids=None if inputs.lids is None else inputs.lids[i : i + 1],
                        d_factor=inputs.d_factor, p_factor=inputs.p_factor,
                        e_factor=inputs.e_factor, clean_text=inputs.clean_text,
                    )
                    kw = {"wire": "mulaw"} if device_wire else {}
                    for chunk in streamer.stream(row, **kw):
                        if not len(chunk):
                            continue
                        if mulaw:
                            if chunk.dtype == np.uint8:  # device-encoded
                                emit(chunk.tobytes())
                            else:
                                from ..ops.mulaw import mulaw_encode_np

                                emit(mulaw_encode_np(chunk).tobytes())
                        else:
                            emit((np.clip(chunk, -1, 1) * 32767.0)
                                 .astype("<i2").tobytes())
                self.wfile.write(b"0\r\n\r\n")
            except Exception:
                log.exception("stream failed")
                self.close_connection = True

        def _respond_audio(self, fmt, pending):
            if fmt == "mulaw":
                # raw 8-bit µ-law codes; decode with ops.mulaw.mulaw_decode
                if pending.mulaw is not None:
                    body = pending.mulaw.tobytes()
                else:  # mixed batch fetched pcm16: transcode host-side
                    from ..ops.mulaw import mulaw_encode_np

                    body = mulaw_encode_np(
                        pending.pcm16.astype(np.float32) / 32767.0).tobytes()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Sample-Rate", str(pending.sample_rate))
                self.send_header("X-Encoding", "mulaw")
                if pending.truncated:
                    self.send_header("X-Truncated", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if pending.pcm16 is None and pending.mulaw is not None:
                # defensive: a non-mulaw fmt on a mulaw-wire batch
                from ..ops.mulaw import mulaw_decode

                pending.pcm16 = np.round(
                    mulaw_decode(pending.mulaw) * 32767.0).astype("<i2")
            pcm = pending.pcm16.astype("<i2", copy=False)
            if fmt == "json":
                self._json(200, {
                    "sample_rate": pending.sample_rate,
                    "pcm16_b64": base64.b64encode(pcm.tobytes()).decode(),
                    "latency_ms": pending.latency_ms,
                    "truncated": pending.truncated,
                })
            elif fmt == "pcm16":
                body = pcm.tobytes()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Sample-Rate", str(pending.sample_rate))
                if pending.truncated:
                    self.send_header("X-Truncated", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                body = _wav_bytes(pcm, pending.sample_rate)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                if pending.truncated:
                    self.send_header("X-Truncated", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return Handler


def _lang_kw(model, language):
    """OptiSpeech uses `language=`, ExportedOptiSpeech uses `lang=`."""
    if language is None:
        return {}
    import inspect

    params = inspect.signature(model.prepare_input).parameters
    return {"language" if "language" in params else "lang": language}


def prewarm(model, max_batch: int = 32, frames_per_token: int = 8,
            stream: bool = True) -> dict:
    """Compile/load every serving graph BEFORE the server binds its port
    (VERDICT r3 item 8): first-request p95 then equals steady-state p95
    instead of hiding a multi-second (artifact load) to multi-minute (live
    jit through the TPU tunnel) warm-up inside the first client's latency.

    - Exported artifacts: replays every (text bucket x batch rung) graph and
      the stream graphs once (deserialized jax.export artifacts compile for
      the local device on first call).
    - Live checkpoints: compiles the single-graph serving path for every
      power-of-two batch rung up to `max_batch` at the default frame rung,
      in both wire formats (pcm16 + µ-law). Other frame rungs still compile
      lazily — the ladder is open-ended for live models.

    Returns {graph_key: seconds} timings."""
    import jax

    from ..values import InferenceInputs

    timings: dict = {}
    has_spk = getattr(model, "num_speakers", 1) > 1

    def dummy(rows: int, t: int) -> InferenceInputs:
        return InferenceInputs.from_ids_and_lengths(
            ids=[[1] * t] * rows, lengths=[t] * rows, clean_text="prewarm",
            sids=[0] * rows if has_spk else None,
            lids=None,
            d_factor=1.0, p_factor=1.0, e_factor=1.0,
        )

    if hasattr(model, "_rungs"):  # ExportedOptiSpeech
        for tb in model.text_buckets:
            for nb in model._rungs.get(tb, [1]):
                t0 = time.perf_counter()
                model.synthesise(dummy(nb, tb))
                timings[f"encode_{tb}_b{nb}"] = round(time.perf_counter() - t0, 3)
        if stream and getattr(model, "stream_meta", None):
            from ..export.exporter import ExportedStreamingSynthesiser

            t0 = time.perf_counter()
            streamer = ExportedStreamingSynthesiser(model)
            for _ in streamer.stream(dummy(1, model.text_buckets[0])):
                pass
            timings["stream"] = round(time.perf_counter() - t0, 3)
    elif hasattr(model, "synthesise_on_device"):  # live checkpoint
        from ..utils.bucketing import round_up_pow2_bucket

        tb = model.text_bucket
        cap = getattr(getattr(model, "cfg", None), "data", None)
        cap = getattr(cap, "max_mel_len", None) or 4096
        n_frames = round_up_pow2_bucket(tb * frames_per_token, model.mel_bucket, cap)
        nb = 1
        while nb <= max_batch:
            for fmt in ("pcm16", "mulaw"):
                t0 = time.perf_counter()
                out = model.synthesise_on_device(
                    dummy(nb, tb), n_frames,
                    pcm16=fmt == "pcm16", mulaw=fmt == "mulaw")
                jax.block_until_ready(out)
                timings[f"b{nb}_{fmt}"] = round(time.perf_counter() - t0, 3)
            nb *= 2
    total = sum(timings.values())
    log.info(f"prewarm: {len(timings)} graphs in {total:.1f}s")
    return timings


def serve(model, host: str = "0.0.0.0", port: int = 8000,
          max_batch: int = 32, batch_wait_ms: float = 20.0,
          stream_chunk_frames: int = 256, stream_overlap: int | None = None,
          request_timeout_s: float = 300.0, max_pending: int = 256):
    batcher = Batcher(model, max_batch=max_batch, wait_ms=batch_wait_ms,
                      max_pending=max_pending)
    handler = make_handler(model, batcher, timeout_s=request_timeout_s,
                           stream_chunk_frames=stream_chunk_frames,
                           stream_overlap=stream_overlap)
    httpd = ThreadingHTTPServer((host, port), handler)
    httpd.batcher = batcher  # exposed for tests/metrics
    return httpd


def main(argv=None):
    p = argparse.ArgumentParser(description="OptiSpeech-TPU batching HTTP server")
    p.add_argument("model", help="inference checkpoint dir or exported artifact dir")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=32,
                   help="max sentence rows per device batch")
    p.add_argument("--batch-wait-ms", type=float, default=20.0,
                   help="how long an idle batch waits for co-batchees")
    p.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    p.add_argument("--stream-chunk-frames", type=int, default=256,
                   help="frames per /stream window")
    p.add_argument("--request-timeout", type=float, default=300.0,
                   help="per-request wait on the batcher (first calls compile)")
    p.add_argument("--max-pending", type=int, default=256,
                   help="queued-request bound; overflow answers 429")
    p.add_argument("--no-fused", action="store_true",
                   help="disable the fused-Pallas ConvNeXt serving path")
    p.add_argument("--no-prewarm", action="store_true",
                   help="skip compiling/loading all serving graphs before "
                        "binding the port (first requests then pay warm-up)")
    args = p.parse_args(argv)

    # persistent compile cache: new batch shapes jit-compile on first use
    # (same default as bench.py / the train CLI)
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()

    model = load_model(args.model, bf16=args.bf16, fused=not args.no_fused)
    if not args.no_prewarm:
        log.info("prewarming serving graphs (skip with --no-prewarm)...")
        prewarm(model, max_batch=args.max_batch)
    httpd = serve(model, args.host, args.port, args.max_batch, args.batch_wait_ms,
                  stream_chunk_frames=args.stream_chunk_frames,
                  request_timeout_s=args.request_timeout,
                  max_pending=args.max_pending)
    log.info(f"Serving on http://{args.host}:{args.port} "
             f"(max_batch={args.max_batch}, wait={args.batch_wait_ms} ms)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
