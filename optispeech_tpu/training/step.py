"""The compiled GAN training step.

Capability parity with the reference's manual-optimization Lightning loop
(/root/reference/optispeech/model/base_lightning_module.py:78-186):
- generator update: AM loss + (post-pretraining) adversarial/fm/mel/MR-STFT
  losses through frozen discriminator params,
- discriminator update on cached generator outputs
  (train_args.cache_generator_outputs=True path), gated by
  `step >= pretraining_steps` via `lax.cond`,
- gradient clipping and AdamW for both, cosine-with-warmup stepped per step.

TPU-first: both updates live in ONE jitted function. Under a
`jax.sharding.Mesh` the batch arrives sharded on the `data` axis with
replicated params, so AD of the global-mean loss produces the gradient
all-reduce automatically over ICI — the Lightning-DDP/NCCL role
(SURVEY.md section 2.7)."""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import ExperimentConfig
from ..ops.segments import get_segments
from .state import TrainState, make_optimizer


def make_train_step(cfg: ExperimentConfig, generator, discriminator, optimizer=None,
                    donate: bool = False, jit: bool = True):
    """`donate=True` donates the TrainState buffers to the jit (params + both
    optimizer states update in place, halving their HBM footprint during the
    step). The caller must not reuse the old state afterwards — the Trainer
    doesn't; unit tests that diff old vs new params keep donate=False.

    `jit=False` returns the raw (untraced) step so a caller can compose it
    inside a larger jitted function (make_cached_train_step)."""
    opt = optimizer or make_optimizer(cfg)
    hop = cfg.generator.features.hop_length
    pretraining_steps = cfg.train_args.pretraining_steps
    # `state.step` counts micro-batches; `pretraining_steps` counts OPTIMIZER
    # steps (the reference gates on Lightning's global_step, which advances
    # once per accumulation window — base_lightning_module.py:124-126,295-303).
    # With gradient_accumulate_batches=k the gate must last k× micro-batches.
    accum = cfg.train_args.gradient_accumulate_batches or 1

    def g_forward(g_params, d_params, batch, rng, train_discriminator):
        drng, srng = jax.random.split(rng)
        # `wav_seg` path: the HOST sampled the segment starts and shipped only
        # the matching GT crop — the full waveform batch (~75% of the
        # host->device bytes per step) never crosses the link. `wav` path:
        # legacy/self-contained — the generator samples starts on device and
        # the GT crop is gathered here.
        host_seg = "wav_seg" in batch
        gen_out = generator.apply(
            {"params": g_params},
            x=batch["x"], x_lengths=batch["x_lengths"],
            mel=batch["mel"].astype(jnp.float32),
            mel_lengths=batch["mel_lengths"], pitches=batch["pitches"],
            energies=batch["energies"], sids=batch.get("sids"), lids=batch.get("lids"),
            deterministic=False, rngs={"dropout": drng, "segment": srng},
            start_idx=batch["start_idx"] if host_seg else None,
        )
        wav_hat = gen_out["wav_hat"]
        if host_seg:
            wav = batch["wav_seg"]
        else:
            # matching GT waveform segment (reference
            # base_lightning_module.py:38-44); the generator returns its ACTUAL
            # (t_mel-clamped) segment size — using cfg.segment_size here would
            # mismatch wav_hat when segment_size exceeds the mel bucket
            # (reference uses gen_outputs["segment_size"] the same way)
            wav = get_segments(
                batch["wav"][:, None, :],
                gen_out["start_idx"] * hop, gen_out["segment_size"] * hop,
            )[:, 0, :]

        def with_adv(_):
            adv_loss, log = discriminator.apply(
                {"params": d_params}, wav, wav_hat,
                method=type(discriminator).forward_gen,
            )
            return adv_loss, log

        def without_adv(_):
            zeros = {k: jnp.zeros(()) for k in (
                "loss_gen_mp", "loss_gen_mrd", "loss_fm_mp", "loss_fm_mrd",
                "mel_loss", "mr_stft_loss")}
            return jnp.zeros(()), zeros

        adv_loss, adv_log = jax.lax.cond(train_discriminator, with_adv, without_adv, None)
        loss = gen_out["loss"] + adv_loss
        aux = {
            "wav": wav,
            "wav_hat": wav_hat,
            "log": {
                "total_loss/train_am_loss": gen_out["loss"],
                "total_loss/train_gen_adv_loss": adv_loss,
                "total_loss/generator": loss,
                "gen_subloss/train_align_loss": gen_out["align_loss"],
                "gen_subloss/train_duration_loss": gen_out["duration_loss"],
                "gen_subloss/train_pitch_loss": gen_out["pitch_loss"],
                "gen_subloss/train_energy_loss": gen_out["energy_loss"],
                **{f"gen_adv_loss/train_{k}": v for k, v in adv_log.items()},
            },
        }
        return loss, aux

    def train_step(state: TrainState, batch: dict):
        rng, g_rng = jax.random.split(state.rng)
        train_disc = state.step // accum >= pretraining_steps

        # ---- generator update --------------------------------------------
        (g_loss, aux), g_grads = jax.value_and_grad(g_forward, has_aux=True)(
            state.g_params, state.d_params, batch, g_rng, train_disc
        )
        g_updates, g_opt_state = opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        logs = dict(aux["log"])
        logs["grad_norm/generator"] = optax.global_norm(g_grads)

        # ---- discriminator update (gated by pretraining window) -----------
        if cfg.train_args.cache_generator_outputs:
            # reuse the G step's waveforms (reference train_args default)
            wav = jax.lax.stop_gradient(aux["wav"])
            wav_hat = jax.lax.stop_gradient(aux["wav_hat"])
        else:
            # recompute the generator without gradients for the D turn
            # (reference base_lightning_module.py:166-169 torch.no_grad path)
            _, aux2 = g_forward(
                jax.lax.stop_gradient(g_params), state.d_params, batch, g_rng,
                jnp.asarray(False),
            )
            wav = jax.lax.stop_gradient(aux2["wav"])
            wav_hat = jax.lax.stop_gradient(aux2["wav_hat"])

        def d_loss_fn(d_params):
            loss, log = discriminator.apply(
                {"params": d_params}, wav, wav_hat,
                method=type(discriminator).forward_disc,
            )
            return loss, log

        def update_d(_):
            (d_loss, d_log), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params
            )
            d_updates, d_opt_state = opt.update(d_grads, state.d_opt_state, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            return d_params, d_opt_state, d_loss, d_log, optax.global_norm(d_grads)

        def skip_d(_):
            zero_log = {"loss_mp": jnp.zeros(()), "loss_mrd": jnp.zeros(())}
            return state.d_params, state.d_opt_state, jnp.zeros(()), zero_log, jnp.zeros(())

        d_params, d_opt_state, d_loss, d_log, d_gnorm = jax.lax.cond(
            train_disc, update_d, skip_d, None
        )
        logs["total_loss/discriminator"] = d_loss
        logs.update({f"discriminator/{k}": v for k, v in d_log.items()})
        logs["grad_norm/discriminator"] = d_gnorm

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        return new_state, logs

    if jit:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return train_step


def make_cached_train_step(cfg: ExperimentConfig, generator, discriminator, cache,
                           optimizer=None, donate: bool = False):
    """Train step over a device-resident feature cache
    (data/device_cache.DeviceFeatureCache).

    The host ships only (idx, start_idx) integer vectors per step; batch
    assembly (row gather + static slice + GT segment crop) runs on device
    inside the same jit as the GAN update. t_text/t_mel are static (one
    compiled variant per bucket pair, exactly like the host-assembled path).

    The arena pytree is a jit ARGUMENT (bound here, constant buffers across
    calls): closing over 0.4+ GB of concrete device arrays would embed them
    in the HLO as literal constants, which overflows the remote-compile
    transport on the tunneled harness (HTTP 413) and bloats compile caches."""
    from ..data.device_cache import gather_arenas

    base = make_train_step(cfg, generator, discriminator, optimizer,
                           donate=False, jit=False)
    segment_size = cfg.generator.segment_size
    hop_length = cfg.generator.features.hop_length
    arenas = cache.arenas()
    wav_scale = cache._wav_scale

    @partial(jax.jit, static_argnames=("t_text", "t_mel"),
             donate_argnums=(0,) if donate else ())
    def cached_step(state: TrainState, arenas: dict, idx_start,
                    t_text: int, t_mel: int):
        # idx_start: ONE (B, 2) int32 array (item indices; segment starts) —
        # a single host->device transfer per step, issued inside the dispatch
        # (each separate transfer through the tunneled harness costs a fixed
        # ~35 ms round trip). Batch-major so the data axis shards as usual.
        batch = gather_arenas(arenas, idx_start[:, 0], idx_start[:, 1],
                              t_text, t_mel, segment_size, hop_length, wav_scale)
        return base(state, batch)

    def step(state: TrainState, idx_start, *, t_text: int, t_mel: int):
        return cached_step(state, arenas, idx_start, t_text=t_text, t_mel=t_mel)

    return step


def make_cached_scan_step(cfg: ExperimentConfig, generator, discriminator, cache,
                          optimizer=None, donate: bool = False):
    """K GAN train steps in ONE dispatch: `lax.scan` over a (K, B, 2) index
    array against the device-resident feature cache.

    Rationale: through the tunneled harness each dispatch costs ~130 ms of
    fixed overhead on top of the ~185 ms compiled step at batch 128 (the RPC
    serializes the ~10^3-leaf state handle tree); scanning K steps amortizes
    that to 1/K. The trade is static shapes: every step in the chunk shares
    (t_text, t_mel), so chunks pad to the widest batch in the chunk (the A/B
    in scripts/train_dispatch_ab.py quantifies overhead-saved vs pad-waste).
    Logs come back stacked (K,) per metric."""
    from ..data.device_cache import gather_arenas

    base = make_train_step(cfg, generator, discriminator, optimizer,
                           donate=False, jit=False)
    segment_size = cfg.generator.segment_size
    hop_length = cfg.generator.features.hop_length
    arenas = cache.arenas()
    wav_scale = cache._wav_scale

    @partial(jax.jit, static_argnames=("t_text", "t_mel"),
             donate_argnums=(0,) if donate else ())
    def scan_steps(state: TrainState, arenas: dict, idx_start_k,
                   t_text: int, t_mel: int):
        def body(state, idx_start):
            batch = gather_arenas(arenas, idx_start[:, 0], idx_start[:, 1],
                                  t_text, t_mel, segment_size, hop_length,
                                  wav_scale)
            return base(state, batch)

        return jax.lax.scan(body, state, idx_start_k)

    def steps(state: TrainState, idx_start_k, *, t_text: int, t_mel: int):
        return scan_steps(state, arenas, idx_start_k, t_text=t_text, t_mel=t_mel)

    return steps


def make_val_step(cfg: ExperimentConfig, generator, discriminator):
    """Validation forward (reference base_lightning_module.py:195-254, minus
    host-side perceptual metrics which live in training/metrics.py)."""
    hop = cfg.generator.features.hop_length

    @jax.jit
    def val_step(state: TrainState, batch: dict, rng):
        drng, srng = jax.random.split(rng)
        host_seg = "wav_seg" in batch
        gen_out = generator.apply(
            {"params": state.g_params},
            x=batch["x"], x_lengths=batch["x_lengths"],
            mel=batch["mel"].astype(jnp.float32),
            mel_lengths=batch["mel_lengths"], pitches=batch["pitches"],
            energies=batch["energies"], sids=batch.get("sids"), lids=batch.get("lids"),
            deterministic=True, rngs={"segment": srng},
            start_idx=batch["start_idx"] if host_seg else None,
        )
        if host_seg:
            wav = batch["wav_seg"]
        else:
            wav = get_segments(
                batch["wav"][:, None, :],
                gen_out["start_idx"] * hop, gen_out["segment_size"] * hop,
            )[:, 0, :]
        val_loss, val_log = discriminator.apply(
            {"params": state.d_params}, wav, gen_out["wav_hat"],
            method=type(discriminator).forward_val,
        )
        logs = {
            "total_loss/val_am_loss": gen_out["loss"],
            "total_loss/val_gen_adv_loss": val_loss,
            "gen_subloss/val_align_loss": gen_out["align_loss"],
            "gen_subloss/val_duration_loss": gen_out["duration_loss"],
            "gen_subloss/val_pitch_loss": gen_out["pitch_loss"],
            "gen_subloss/val_energy_loss": gen_out["energy_loss"],
            **{f"gen_adv_loss/val_{k}": v for k, v in val_log.items()},
            "total_loss/val_total": gen_out["loss"] + val_loss,
        }
        return logs, wav, gen_out["wav_hat"]

    return val_step
