"""The binarization loss must backpropagate into the alignment module while
the DP/duration path stays detached (reference alignments.py:232-237: MAS runs
on detached numpy, the bin-loss gather reads the live tensor)."""

import jax
import jax.numpy as jnp
import numpy as np

from optispeech_tpu.ops.mas import viterbi_decode


def test_bin_loss_grad_flows_durations_do_not(rng):
    b, f, t = 2, 20, 6
    lp = jnp.log(jnp.asarray(rng.dirichlet(np.ones(t), size=(b, f)).astype(np.float32)) + 1e-8)
    tl = jnp.asarray([6, 4])
    fl = jnp.asarray([20, 14])

    def bin_only(x):
        _, bl = viterbi_decode(x, tl, fl)
        return bl

    g = jax.grad(bin_only)(lp)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0  # gradient reaches log_p_attn via the gather
    # gradient is exactly the -1/feats_len one-hot of the chosen path per item
    nz_per_item = (np.abs(g) > 0).reshape(b, -1).sum(axis=1)
    np.testing.assert_array_equal(nz_per_item, np.asarray(fl))

    def dur_sum(x):
        ds, _ = viterbi_decode(x, tl, fl)
        return jnp.sum(ds * ds)

    g2 = np.asarray(jax.grad(dur_sum)(lp))
    assert np.abs(g2).sum() == 0  # durations carry no gradient


def test_generator_alignment_module_receives_gradient(rng):
    from optispeech_tpu.models.generator import OptiSpeechGenerator
    from test_generator import make_batch, tiny_cfg

    model = OptiSpeechGenerator(tiny_cfg())
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k, "segment": k}, **batch, deterministic=True
    ))(key)

    def loss_fn(params):
        out = model.apply({"params": params}, **batch, deterministic=True,
                          rngs={"segment": jax.random.PRNGKey(1)})
        return out["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    align_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), grads["alignment_module"], 0.0
    )
    assert align_grad > 0  # forward-sum + binarization losses train alignment
