"""Hybrid (DCN x ICI) multi-slice data-parallel mesh: the 8-virtual-device
harness models 2 slices x 4 chips. The training step must produce the same
numbers as the flat 1-D data mesh — the hierarchy only changes which wires
the all-reduce rides."""

import jax
import numpy as np

from optispeech_tpu.parallel.mesh import (
    hybrid_data_sharding,
    make_hybrid_mesh,
    make_mesh,
    replicate_state,
    shard_batch,
)
from optispeech_tpu.training.step import make_train_step

from test_train_step import _build, synth_batch, tiny_experiment


def test_hybrid_mesh_shape_and_sharding():
    mesh = make_hybrid_mesh(2)
    assert mesh.axis_names == ("dcn_data", "data")
    assert mesh.shape["dcn_data"] == 2
    assert mesh.shape["data"] == jax.device_count() // 2
    sharding = hybrid_data_sharding(mesh)
    assert sharding.spec == jax.sharding.PartitionSpec(("dcn_data", "data"))


def test_hybrid_train_step_matches_flat_mesh(rng):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg = tiny_experiment(pretraining_steps=0)
    generator, discriminator, state = _build(cfg)
    step_fn = make_train_step(cfg, generator, discriminator)

    flat = make_mesh(8)
    s1, l1 = step_fn(
        replicate_state(state, flat),
        shard_batch(synth_batch(np.random.default_rng(0), cfg, b=8), flat),
    )

    hybrid = make_hybrid_mesh(2)  # 2 "slices" x 4 devices
    s2, l2 = step_fn(
        replicate_state(state, hybrid),
        shard_batch(synth_batch(np.random.default_rng(0), cfg, b=8), hybrid),
    )
    # batch rows land sharded over both axes; params stay replicated
    leaf = jax.tree_util.tree_leaves(s2.g_params)[0]
    assert leaf.sharding.is_fully_replicated
    np.testing.assert_allclose(
        float(l1["total_loss/generator"]), float(l2["total_loss/generator"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(l1["total_loss/discriminator"]), float(l2["total_loss/discriminator"]),
        rtol=2e-4,
    )
