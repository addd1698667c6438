from .bucketing import round_up_to_bucket, pad_to_length
from .pylogger import get_pylogger

__all__ = ["round_up_to_bucket", "pad_to_length", "get_pylogger"]
