"""Training loop orchestration (the reference's Lightning Trainer role, L6/L7).

Capability parity targets (SURVEY.md sections 3.1, 5):
- two-network GAN loop in one compiled step (training/step.py),
- periodic validation with structured metric namespaces
  (total_loss/*, gen_subloss/*, discriminator/*, grad_norm/*),
- rolling orbax checkpoints of the FULL state (both optimizers, step, RNG),
  one-call resume, plus inference-checkpoint export,
- data-parallel mesh with per-step sharded batches,
- debug knobs: jax debug_nans (the detect_anomaly analogue), overfit-N-batches
  harness (configs/debug/overfit.yaml analogue), fast_dev_run.
"""

import contextlib
import json
import os
import time
from typing import Iterable, Optional

import jax
import numpy as np

from ..config import ExperimentConfig
from ..models.discriminator.vocos import VocosDiscriminator
from ..models.generator import OptiSpeechGenerator
from ..parallel import make_mesh, replicate_state, shard_batch
from ..utils.pylogger import get_pylogger
from .checkpoint import TrainCheckpointManager, save_inference_checkpoint
from .state import init_train_state
from .step import make_train_step, make_val_step

log = get_pylogger(__name__)


class MetricLogger:
    """CSV + optional TensorBoard metric sink (reference logger capability,
    configs/logger/*)."""

    def __init__(self, out_dir: str, use_tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.csv_path = os.path.join(out_dir, "metrics.csv")
        if not os.path.exists(self.csv_path):
            with open(self.csv_path, "w") as f:
                f.write("step,metric,value\n")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(out_dir)
            except ImportError:
                pass

    def log(self, step: int, metrics: dict):
        metrics = {k: float(v) for k, v in metrics.items()}
        # long format: train/val/any namespace can appear at any step
        with open(self.csv_path, "a") as f:
            for k in sorted(metrics):
                f.write(f"{step},{k},{metrics[k]}\n")
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, v, step)

    def close(self):
        if self.tb is not None:
            self.tb.close()


class Trainer:
    def __init__(self, cfg: ExperimentConfig, out_dir: str = "runs/dev",
                 debug_nans: bool = False, mesh=None):
        self.cfg = cfg
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        if debug_nans:
            jax.config.update("jax_debug_nans", True)
        import jax.numpy as jnp

        compute_dtype = (
            jnp.bfloat16 if cfg.train_args.compute_dtype == "bfloat16" else jnp.float32
        )
        self.generator = OptiSpeechGenerator(cfg.generator, dtype=compute_dtype)
        self.discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.num_devices)
        self.train_step = make_train_step(cfg, self.generator, self.discriminator)
        self.val_step = make_val_step(cfg, self.generator, self.discriminator)
        self.metrics = MetricLogger(out_dir)
        self.ckpt = TrainCheckpointManager(
            os.path.join(out_dir, cfg.ckpt_dir), keep=cfg.ckpt_keep
        )

    def init_or_restore_state(self, seed: int = None, forced_resume_from: str = None):
        state = init_train_state(
            self.cfg, self.generator, self.discriminator,
            jax.random.PRNGKey(seed if seed is not None else self.cfg.seed),
        )
        if forced_resume_from:
            # load only the weights; fresh optimizers/schedules
            # (reference train.py:82-87 `forced_resume` with strict=False)
            from .checkpoint import load_inference_checkpoint

            _, params, _ = load_inference_checkpoint(forced_resume_from)
            state = state.replace(g_params=params)
            log.info(f"Force-resumed generator weights from {forced_resume_from}")
        else:
            restored, step = self.ckpt.restore(jax.device_get(state))
            if restored is not None:
                log.info(f"Restored training state from step {step}")
                state = restored
        return replicate_state(state, self.mesh)

    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        max_steps: Optional[int] = None,
        state=None,
        fast_dev_run: bool = False,
        profile_steps: Optional[tuple[int, int]] = None,
    ):
        """`profile_steps=(start, stop)` captures a jax.profiler trace of those
        steps to out_dir/profile (reference configs/debug/profiler.yaml role)."""
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        if fast_dev_run:
            max_steps = 1
        state = state if state is not None else self.init_or_restore_state()
        step = int(jax.device_get(state.step))
        t_last = time.perf_counter()
        steps_since = 0

        # preemption safety: TPU maintenance events deliver SIGTERM; convert
        # to KeyboardInterrupt so the finally-block checkpoints before exit
        # (SURVEY.md §5 failure detection/elastic recovery)
        import signal

        def _sigterm(_sig, _frm):
            raise KeyboardInterrupt("SIGTERM (preemption)")

        old_handler = signal.signal(signal.SIGTERM, _sigterm)
        try:
            while step < max_steps:
                for batch in train_loader:
                    if profile_steps and step == profile_steps[0]:
                        jax.profiler.start_trace(os.path.join(self.out_dir, "profile"))
                    batch = shard_batch(self._device_batch(batch), self.mesh)
                    state, logs = self.train_step(state, batch)
                    if profile_steps and step == profile_steps[1]:
                        jax.block_until_ready(state.step)
                        jax.profiler.stop_trace()
                    step += 1
                    steps_since += 1
                    if step % cfg.log_every_n_steps == 0 or fast_dev_run:
                        logs = jax.device_get(logs)
                        dt = time.perf_counter() - t_last
                        logs["perf/steps_per_sec"] = steps_since / max(dt, 1e-9)
                        t_last, steps_since = time.perf_counter(), 0
                        self.metrics.log(step, logs)
                        log.info(
                            f"step {step}: g={logs['total_loss/generator']:.4f} "
                            f"d={logs['total_loss/discriminator']:.4f} "
                            f"({logs['perf/steps_per_sec']:.2f} it/s)"
                        )
                    if val_loader is not None and step % cfg.val_every_n_steps == 0:
                        self.validate(state, val_loader, step)
                    if step % cfg.ckpt_every_n_steps == 0 or fast_dev_run:
                        self.ckpt.save(step, state, cfg)
                    if step >= max_steps:
                        break
        except KeyboardInterrupt:
            log.info("Interrupted/preempted — saving checkpoint before exit")
        finally:
            signal.signal(signal.SIGTERM, old_handler)
            self.ckpt.save(step, state, cfg)
            self.ckpt.wait()
            self.metrics.close()
        return state

    def validate(self, state, val_loader, step: int):
        rng = jax.random.PRNGKey(step)
        agg: dict = {}
        n = 0
        first_wavs = None
        for batch in val_loader:
            batch = shard_batch(self._device_batch(batch), self.mesh)
            logs, wav, wav_hat = self.val_step(state, batch, rng)
            logs = jax.device_get(logs)
            if first_wavs is None:
                first_wavs = (np.asarray(wav), np.asarray(wav_hat))
            for k, v in logs.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
        if not n:
            return
        # host-side perceptual eval on the first batch (reference
        # base_lightning_module.py:216-245; gated like train_args flags)
        if self.cfg.train_args.evaluate_periodicity and first_wavs is not None:
            from .metrics import periodicity_metrics, resample_to_16k

            sr = self.cfg.generator.features.sample_rate
            refs = [resample_to_16k(w, sr) for w in first_wavs[0][:4]]
            gens = [resample_to_16k(w, sr) for w in first_wavs[1][:4]]
            perio, pitch_rmse, f1 = periodicity_metrics(refs, gens)
            agg["val/periodicity_loss"] = perio * n
            agg["val/perio_pitch_loss"] = pitch_rmse * n
            agg["val/f1_score"] = f1 * n
        if self.cfg.train_args.evaluate_pesq and first_wavs is not None:
            from .metrics import pesq_score, resample_to_16k

            sr = self.cfg.generator.features.sample_rate
            try:
                score = pesq_score(
                    [resample_to_16k(w, sr) for w in first_wavs[0][:4]],
                    [resample_to_16k(w, sr) for w in first_wavs[1][:4]],
                )
                agg["val/pesq"] = score * n
            except ImportError:
                log.warning("evaluate_pesq set but the pesq package is unavailable")
        self.metrics.log(step, {k: v / n for k, v in agg.items()})
        if first_wavs is not None:
            self._log_samples(step, first_wavs)
        log.info(f"val @ {step}: total={agg['total_loss/val_total'] / n:.4f}")

    def _log_samples(self, step: int, first_wavs):
        """GT + generated audio and mel images to TensorBoard
        (reference base_lightning_module.py:256-286)."""
        if self.metrics.tb is None:
            return
        from ..data.dsp import log_mel_spectrogram_np

        f = self.cfg.generator.features
        for i in range(min(2, first_wavs[0].shape[0])):
            gt, gen = first_wavs[0][i], first_wavs[1][i]
            try:  # tensorboardX audio needs the optional soundfile package
                self.metrics.tb.add_audio(f"wav/original_{i}", gt[:, None], step, f.sample_rate)
                self.metrics.tb.add_audio(f"wav/generated_{i}", gen[:, None], step, f.sample_rate)
            except (ImportError, ModuleNotFoundError):
                pass
            mel = log_mel_spectrogram_np(
                np.asarray(gen, np.float32), f.sample_rate, f.n_fft, f.hop_length,
                f.win_length, f.n_feats, f.f_min, f.f_max,
            )
            lo, hi = mel.min(), mel.max()
            img = (mel - lo) / max(hi - lo, 1e-6)
            self.metrics.tb.add_image(f"mel/generated_{i}", img[None, ::-1, :], step)

    def export_inference_checkpoint(self, state, path: str):
        save_inference_checkpoint(path, self.cfg, jax.device_get(state.g_params))

    @staticmethod
    def _device_batch(batch: dict) -> dict:
        return {
            k: v for k, v in batch.items()
            if k in ("x", "wav", "mel", "x_lengths", "wav_lengths", "mel_lengths",
                     "energies", "pitches", "sids", "lids")
        }
