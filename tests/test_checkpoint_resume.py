"""Full-training-state checkpoint / resume round-trip (SURVEY.md §5)."""

import dataclasses

import jax
import numpy as np

from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.training.checkpoint import TrainCheckpointManager
from optispeech_tpu.training.state import init_train_state
from optispeech_tpu.training.step import make_train_step

from test_train_step import synth_batch, tiny_experiment


def test_train_state_save_restore_continue(tmp_path, rng):
    cfg = dataclasses.replace(tiny_experiment(pretraining_steps=0), ckpt_keep=2)
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = synth_batch(rng, cfg, b=4)

    state, _ = step_fn(state, batch)
    state, _ = step_fn(state, batch)

    mgr = TrainCheckpointManager(str(tmp_path / "ck"), keep=2)
    mgr.save(2, state, cfg)
    mgr.wait()
    assert mgr.latest_step() == 2

    template = jax.device_get(init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0)))
    restored, step = mgr.restore(template)
    assert step == 2
    assert int(restored.step) == 2
    # params identical
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        jax.device_get(state.g_params), restored.g_params,
    ))
    assert same

    # resumed state continues training bit-identically to the original
    cont_a, logs_a = step_fn(state, batch)
    cont_b, logs_b = step_fn(jax.device_put(restored), batch)
    np.testing.assert_allclose(
        float(logs_a["total_loss/generator"]), float(logs_b["total_loss/generator"]), rtol=1e-5
    )


def test_loader_state_retained_per_step(tmp_path, rng):
    """Every KEPT checkpoint resumes with its own data-iterator state (not
    just the latest save), and pruned steps drop theirs (ADVICE r2)."""
    cfg = dataclasses.replace(tiny_experiment(pretraining_steps=0), ckpt_keep=2)
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))

    mgr = TrainCheckpointManager(str(tmp_path / "ck"), keep=2)
    for step in (1, 2, 3):
        mgr.save(step, state, cfg, loader_state={"epoch": step, "pos": step * 10})
        mgr.wait()

    # keep=2: steps 2 and 3 retained, each with its own loader state
    assert mgr.loader_state(2) == {"epoch": 2, "pos": 20}
    assert mgr.loader_state(3) == {"epoch": 3, "pos": 30}
    assert mgr.loader_state(1) is None  # pruned along with checkpoint 1


def test_packed_device_get_matches_device_get():
    """packed_device_get (few large transfers, VERDICT r4 item 6) is
    bit-identical to jax.device_get on a mixed-dtype, mixed-shape pytree
    including scalars and non-array leaves."""
    import jax.numpy as jnp

    from optispeech_tpu.training.checkpoint import packed_device_get

    k = jax.random.PRNGKey(3)
    tree = {
        "a": jax.random.normal(k, (7, 5)),
        "b": {"c": jnp.arange(11, dtype=jnp.int32), "d": jnp.float32(2.5)},
        "rng": jax.random.PRNGKey(9),
        "none": None,
        "pyint": 4,
        "scalar0d": jnp.zeros((), jnp.int32),
    }
    ref = jax.device_get(tree)
    got = packed_device_get(tree)
    flat_r, td_r = jax.tree_util.tree_flatten(ref)
    flat_g, td_g = jax.tree_util.tree_flatten(got)
    assert td_r == td_g
    for r, g in zip(flat_r, flat_g):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
        assert np.asarray(r).dtype == np.asarray(g).dtype
        assert np.asarray(r).shape == np.asarray(g).shape


def test_async_save_survives_donation(tmp_path, rng):
    """The background save snapshots the state BEFORE returning: a donating
    train step that invalidates the old state's buffers immediately after
    save() must not corrupt the checkpoint, and the restored state must be
    the pre-donation one."""
    cfg = dataclasses.replace(tiny_experiment(pretraining_steps=0), ckpt_keep=2)
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, generator, discriminator, donate=True)
    batch = synth_batch(rng, cfg, b=4)

    state, _ = step_fn(state, batch)
    saved_g = jax.device_get(state.g_params)  # pre-donation reference copy

    mgr = TrainCheckpointManager(str(tmp_path / "ck"), keep=2)
    mgr.save(1, state, cfg)          # returns quickly; fetch runs in background
    state, _ = step_fn(state, batch)  # donates (deletes) the saved state's buffers
    mgr.wait()

    template = jax.device_get(
        init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    )
    restored, step = mgr.restore(template)
    assert step == 1
    ok = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        saved_g, restored.g_params,
    ))
    assert ok
