"""Static-shape bucketing helpers.

XLA compiles one program per distinct shape; padding lengths up to bucket
boundaries keeps the number of compiled programs small (SURVEY.md build-plan:
replaces torch's fully dynamic shapes)."""

import numpy as np


def round_up_to_bucket(n: int, bucket: int, minimum: int | None = None) -> int:
    out = max(int(np.ceil(max(n, 1) / bucket)) * bucket, bucket)
    if minimum is not None:
        out = max(out, minimum)
    return out


def round_up_pow2_bucket(n: int, bucket: int, cap: int | None = None) -> int:
    """Round `n` up to `bucket * 2**k` (a geometric shape ladder).

    Linear bucketing (`round_up_to_bucket`) still yields one compiled program
    per multiple of `bucket` — dozens of shapes when an adaptive estimate
    (e.g. the serving frame cap) drifts between batches, each a fresh
    multi-minute XLA compile on a tunneled host. A power-of-two ladder bounds
    the shape space to log2(cap/bucket)+1 rungs at the cost of ≤2× padding."""
    n = max(int(n), 1)
    rung = bucket
    while rung < n and (cap is None or rung < cap):
        rung *= 2
    if cap is not None:
        rung = min(rung, cap)
    return rung


def pad_to_length(arr: np.ndarray, length: int, axis: int = -1, value=0) -> np.ndarray:
    """Right-pad `arr` along `axis` to `length` with `value`."""
    axis = axis % arr.ndim
    cur = arr.shape[axis]
    if cur == length:
        return arr
    if cur > length:
        raise ValueError(f"array dim {cur} exceeds target length {length}")
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, length - cur)
    return np.pad(arr, pad, constant_values=value)
