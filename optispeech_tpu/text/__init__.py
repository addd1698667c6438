"""Text frontend (L1): TextProcessor + tokenizer registry.

Capability parity with /root/reference/optispeech/text/__init__.py."""

from typing import Any

from .normalization import UNICODE_NORM_FORM
from .tokenizers import BaseTokenizer
from . import arabic  # noqa: F401  (registers the `arabic-buck` tokenizer)


class TextProcessor:
    def __init__(
        self,
        tokenizer: str | Any,
        add_blank: bool,
        add_bos_eos: bool,
        normalize_text: bool,
        languages: list[str],
    ):
        self.tokenizer_ref = tokenizer
        self.add_blank = add_blank
        self.add_bos_eos = add_bos_eos
        self.normalize_text = normalize_text
        self.languages = list(languages)
        if isinstance(tokenizer, str):
            tokenizer_cls = BaseTokenizer.get_tokenizer_by_name(tokenizer)
        else:
            tokenizer_cls = tokenizer
        self.tokenizer = tokenizer_cls(
            add_blank=add_blank, add_bos_eos=add_bos_eos, normalize_text=normalize_text
        )
        self.num_languages = len(self.languages)
        self.is_multi_language = self.num_languages > 1
        self.default_language = self.languages[0].strip().lower()

    def __call__(self, text, lang=None, split_sentences: bool = False):
        if lang is None:
            lang = self.default_language
        lang = lang.strip().lower()
        if lang not in self.languages:
            raise ValueError(f"Language {lang} does not exist in the supported language list.")
        return self.tokenizer(text, language=lang, split_sentences=split_sentences)

    @classmethod
    def from_dict(cls, kwargs):
        return cls(**kwargs)

    def asdict(self):
        return dict(
            tokenizer=self.tokenizer.name,
            add_blank=self.add_blank,
            add_bos_eos=self.add_bos_eos,
            normalize_text=self.normalize_text,
            languages=self.languages,
        )

    @classmethod
    def from_config(cls, cfg):
        """Build from a TextProcessorConfig dataclass."""
        return cls(
            tokenizer=cfg.tokenizer,
            add_blank=cfg.add_blank,
            add_bos_eos=cfg.add_bos_eos,
            normalize_text=cfg.normalize_text,
            languages=list(cfg.languages),
        )
