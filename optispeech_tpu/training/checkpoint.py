"""Orbax checkpointing: full training state + minimal inference checkpoints.

Capability parity with the reference's Lightning checkpoint story
(configs/callbacks/model_checkpoint.yaml + save_hyperparameters: the
checkpoint alone reconstructs the whole object graph, reference
model/optispeech.py:26, README.md:83). Here a checkpoint directory holds the
orbax param/state trees plus `config.json`, so
`OptiSpeech.load_from_checkpoint(path)` is a one-call restore. Training
checkpoints add both optimizer states, step counters, and the RNG key
(SURVEY.md section 5 checkpoint/resume).
"""

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ExperimentConfig, from_dict, to_dict


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_inference_checkpoint(path: str, cfg: ExperimentConfig, params, speakers=None):
    path = _abs(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"config": to_dict(cfg), "speakers": speakers or []}, f, indent=2)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "params"), jax.device_get(params), force=True)


def load_inference_checkpoint(path: str):
    path = _abs(path)
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    cfg = from_dict(ExperimentConfig, meta["config"])
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"))
    return cfg, params, meta


class TrainCheckpointManager:
    """Rolling training checkpoints (keep-N, async-capable)."""

    def __init__(self, directory: str, keep: int = 10):
        self.directory = _abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: Any, cfg: ExperimentConfig,
             loader_state: dict | None = None):
        with open(os.path.join(self.directory, "config.json"), "w") as f:
            json.dump({"config": to_dict(cfg)}, f, indent=2)
        if loader_state is not None:
            # data-iterator position (epoch, batch pos) so resume is
            # step-deterministic (SURVEY.md §5; Lightning's loader state).
            # One file per retained step: resuming from ANY kept checkpoint
            # (not just the latest) restores its exact iterator position.
            with open(self._loader_state_path(step), "w") as f:
                json.dump({"step": step, "loader": loader_state}, f)
        self.manager.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        self._prune_loader_states(keep_step=step)

    def _loader_state_path(self, step: int) -> str:
        return os.path.join(self.directory, f"loader_state-{step}.json")

    def _prune_loader_states(self, keep_step: int | None = None):
        # the just-saved step may not be listed yet under async checkpointing
        kept = set(self.manager.all_steps()) | ({keep_step} if keep_step is not None else set())
        for name in os.listdir(self.directory):
            if name.startswith("loader_state-") and name.endswith(".json"):
                try:
                    step = int(name[len("loader_state-"):-len(".json")])
                except ValueError:
                    continue
                if step not in kept:
                    try:
                        os.remove(os.path.join(self.directory, name))
                    except OSError:
                        pass

    def loader_state(self, step: int) -> dict | None:
        """The data-iterator state saved alongside checkpoint `step` (None if
        that save carried no loader state)."""
        path = self._loader_state_path(step)
        if not os.path.exists(path):
            # pre-round-3 layout: single loader_state.json for the latest save
            legacy = os.path.join(self.directory, "loader_state.json")
            if not os.path.exists(legacy):
                return None
            with open(legacy) as f:
                meta = json.load(f)
            return meta["loader"] if meta.get("step") == step else None
        with open(path) as f:
            meta = json.load(f)
        return meta["loader"]

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, state_template, step: int | None = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step

    def wait(self):
        self.manager.wait_until_finished()
