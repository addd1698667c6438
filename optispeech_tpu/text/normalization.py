"""Text normalization helpers (reference optispeech/text/normalization.py)."""

import re
import unicodedata

UNICODE_NORM_FORM = "NFKC"
WHITESPACE_RE = re.compile(r"\s+")


def preprocess_text(text: str, language: str = None, *, normalize: bool = False) -> str:
    if normalize:
        text = unicodedata.normalize(UNICODE_NORM_FORM, text)
    return collapse_whitespace(text)


def collapse_whitespace(text: str) -> str:
    return re.sub(WHITESPACE_RE, " ", text)


def intersperse(lst, item):
    """Insert `item` between (and around) every element (blank tokens)."""
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = lst
    return result
