"""Unit tests for masking / segments / duration ops against numpy oracles and
the reference semantics (SURVEY.md section 4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np

from optispeech_tpu.ops import (
    average_by_duration,
    expand_by_duration,
    gaussian_upsample,
    get_random_segments,
    get_segments,
    make_pad_mask,
    sequence_mask,
)


def test_sequence_mask():
    lengths = jnp.array([3, 1, 5])
    m = sequence_mask(lengths, 5)
    expect = np.array(
        [[1, 1, 1, 0, 0], [1, 0, 0, 0, 0], [1, 1, 1, 1, 1]], dtype=bool
    )
    np.testing.assert_array_equal(np.asarray(m), expect)
    np.testing.assert_array_equal(np.asarray(make_pad_mask(lengths, 5)), ~expect)


def test_get_segments(rng):
    x = jnp.asarray(rng.normal(size=(4, 3, 20)).astype(np.float32))
    starts = jnp.array([0, 5, 10, 12])
    seg = get_segments(x, starts, 8)
    assert seg.shape == (4, 3, 8)
    for i, s in enumerate([0, 5, 10, 12]):
        np.testing.assert_allclose(np.asarray(seg)[i], np.asarray(x)[i, :, s : s + 8])


def test_get_random_segments_bounds(rng):
    x = jnp.asarray(rng.normal(size=(8, 2, 64)).astype(np.float32))
    lengths = jnp.array([64, 32, 10, 64, 20, 8, 50, 64])
    seg, starts = get_random_segments(jax.random.PRNGKey(0), x, lengths, 16)
    assert seg.shape == (8, 2, 16)
    starts = np.asarray(starts)
    max_start = np.maximum(np.asarray(lengths) - 16, 0)
    assert (starts >= 0).all() and (starts <= max_start).all()


def _np_average_by_duration(ds, xs, text_lengths, feats_lengths):
    """Transcription of the reference numba oracle (alignments.py:242-259)."""
    b = ds.shape[0]
    out = np.zeros_like(ds, dtype=np.float64)
    ds = ds.astype(np.int64)
    for i in range(b):
        t_text, t_feats = int(text_lengths[i]), int(feats_lengths[i])
        d = ds[i, :t_text]
        cs = np.concatenate([[0], d.cumsum()])
        x = xs[i, :t_feats]
        for n in range(t_text):
            chunk = x[cs[n] : cs[n + 1]]
            out[i, n] = chunk.mean() if len(chunk) else 0.0
    return out


def test_average_by_duration(rng):
    b, t_text, t_feats = 3, 6, 14
    text_lengths = np.array([6, 4, 5])
    feats_lengths = np.array([14, 9, 11])
    ds = np.zeros((b, t_text), dtype=np.int32)
    for i in range(b):
        n = text_lengths[i]
        remaining = feats_lengths[i]
        parts = rng.multinomial(remaining, np.ones(n) / n)
        ds[i, :n] = parts
    xs = rng.normal(size=(b, t_feats)).astype(np.float32)
    got = average_by_duration(
        jnp.asarray(ds), jnp.asarray(xs), jnp.asarray(text_lengths), jnp.asarray(feats_lengths)
    )
    expect = _np_average_by_duration(ds.astype(np.float64), xs, text_lengths, feats_lengths)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


def test_expand_by_duration(rng):
    x = rng.normal(size=(2, 4, 3)).astype(np.float32)
    ds = np.array([[2, 0, 3, 1], [1, 1, 1, 0]], dtype=np.int32)
    n_frames = 8
    out, lengths = expand_by_duration(jnp.asarray(x), jnp.asarray(ds), n_frames)
    np.testing.assert_array_equal(np.asarray(lengths), [6, 3])
    # item 0: frames = [t0,t0,t2,t2,t2,t3,0,0]
    expect0 = np.stack([x[0, 0], x[0, 0], x[0, 2], x[0, 2], x[0, 2], x[0, 3]] + [np.zeros(3)] * 2)
    np.testing.assert_allclose(np.asarray(out)[0], expect0, rtol=1e-6)
    expect1 = np.stack([x[1, 0], x[1, 1], x[1, 2]] + [np.zeros(3)] * 5)
    np.testing.assert_allclose(np.asarray(out)[1], expect1, rtol=1e-6)


def _torch_gaussian_upsample(hs, ds, h_masks, d_masks, delta=0.1):
    """Oracle: transcription of reference GaussianUpsampling (alignments.py:136)."""
    import torch

    hs, ds = torch.tensor(hs), torch.tensor(ds, dtype=torch.float32)
    h_masks, d_masks = torch.tensor(h_masks), torch.tensor(d_masks)
    B = ds.size(0)
    T_feats = h_masks.size(-1)
    t = torch.arange(0, T_feats).unsqueeze(0).repeat(B, 1).float()
    t = t * h_masks.float()
    c = ds.cumsum(dim=-1) - ds / 2
    energy = -1 * delta * (t.unsqueeze(-1) - c.unsqueeze(1)) ** 2
    energy = energy.masked_fill(~(d_masks.unsqueeze(1).repeat(1, T_feats, 1)), -float("inf"))
    p_attn = torch.softmax(energy, dim=2)
    return torch.matmul(p_attn, hs).numpy()


def test_gaussian_upsample_vs_torch(rng):
    b, t_text, t_feats, c = 2, 5, 12, 4
    hs = rng.normal(size=(b, t_text, c)).astype(np.float32)
    ds = np.array([[3, 2, 4, 2, 1], [2, 2, 2, 0, 0]], dtype=np.float32)
    text_lengths = np.array([5, 3])
    feats_lengths = np.array([12, 6])
    h_masks = np.arange(t_feats)[None] < feats_lengths[:, None]
    d_masks = np.arange(t_text)[None] < text_lengths[:, None]
    got = gaussian_upsample(jnp.asarray(hs), jnp.asarray(ds), jnp.asarray(h_masks), jnp.asarray(d_masks))
    expect = _torch_gaussian_upsample(hs, ds, h_masks, d_masks)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)


def test_duration_to_frame_index_clamps_past_total():
    from optispeech_tpu.ops import duration_to_frame_index

    idx = np.asarray(duration_to_frame_index(jnp.asarray([[2.0, 3.0]]), 8))
    # frames 0-1 -> token 0, frames 2-4 -> token 1, frames past the total
    # duration clamp to the LAST token index (host-side gathers stay in range)
    np.testing.assert_array_equal(idx[0], [0, 0, 1, 1, 1, 1, 1, 1])
