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
