"""Generator checkpoint averaging (tail/Polyak averaging over retained steps).

GAN generators orbit the adversarial equilibrium instead of settling on it, so
the last checkpoint is one noisy sample from that orbit. Averaging the weights
of the last-N retained training checkpoints is the standard zero-retraining
smoother (the ESPnet/fairseq ``average_checkpoints`` recipe; Polyak & Juditsky
1992). The reference keeps top-k Lightning checkpoints
(/root/reference/configs/callbacks/model_checkpoint.yaml) but never averages
them — this is a capability on top of parity, exposed as
``python -m optispeech_tpu.cli.average``.

Only the generator is averaged: the discriminator and optimizer states are
training-time objects with no role in an inference checkpoint, and averaging
adversarial critics is not meaningful.
"""

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ExperimentConfig, from_dict


def _read_only_manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(os.path.expanduser(ckpt_dir)),
        options=ocp.CheckpointManagerOptions(read_only=True),
    )


def load_run_config(ckpt_dir: str) -> ExperimentConfig:
    """The experiment config the TrainCheckpointManager wrote next to its
    numbered step directories."""
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return from_dict(ExperimentConfig, json.load(f)["config"])


def average_generator_params(ckpt_dir: str, steps=None, last_n: int = 5):
    """Mean of ``g_params`` over ``steps`` (default: the last ``last_n``
    retained steps). Accumulates in float64 on host, casts back to each leaf's
    stored dtype. Returns ``(avg_params, steps_used, last_raw_state)`` — the
    raw state dict of the NEWEST step is returned so callers can reuse its
    discriminator params (e.g. for a validation pass) without re-reading."""
    mgr = _read_only_manager(ckpt_dir)
    all_steps = sorted(mgr.all_steps())
    if not all_steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    if steps is None:
        steps = all_steps[-last_n:]
    steps = sorted(int(s) for s in steps)
    missing = [s for s in steps if s not in all_steps]
    if missing:
        raise ValueError(f"steps {missing} not retained; available: {all_steps}")

    acc = None
    dtypes = None
    last_raw = None
    for s in steps:
        raw = mgr.restore(s)
        g = jax.tree_util.tree_map(np.asarray, raw["g_params"])
        if acc is None:
            dtypes = jax.tree_util.tree_map(lambda x: x.dtype, g)
            acc = jax.tree_util.tree_map(lambda x: x.astype(np.float64), g)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + x.astype(np.float64), acc, g
            )
        if s == steps[-1]:
            last_raw = raw
    avg = jax.tree_util.tree_map(
        lambda a, dt: (a / len(steps)).astype(dt), acc, dtypes
    )
    return avg, steps, last_raw
