"""Arabic Buckwalter tokenizer tests."""

import pytest

from optispeech_tpu.text import TextProcessor
from optispeech_tpu.text.arabic import (
    ARABIC_SYMBOLS,
    DOUBLING_TOKEN,
    EOS_TOKEN,
    SEPARATOR_TOKEN,
    arabic_to_buckwalter,
    arabic_to_tokens,
    buckwalter_to_arabic,
    tokens_to_ids,
)


def test_symbol_inventory_contract():
    assert len(ARABIC_SYMBOLS) == 49  # 5 special + 9 punct + 29 consonants + 6 vowels
    assert ARABIC_SYMBOLS[0] == "_pad_"
    assert ARABIC_SYMBOLS[1] == "_eos_"
    assert len(set(ARABIC_SYMBOLS)) == 49


def test_buckwalter_roundtrip():
    text = "السَّلامُ عَلَيكُم"
    bw = arabic_to_buckwalter(text)
    assert buckwalter_to_arabic(bw) == text
    assert all(ord(c) < 0x250 for c in bw)  # ASCII-ish transliteration


def test_phonetization_core_rules():
    # shadda -> doubling token (السَّلام starts with assimilated sun-letter s)
    toks = arabic_to_tokens("السَّلامُ")
    assert DOUBLING_TOKEN in toks
    assert toks[-1] == EOS_TOKEN
    assert "aa" in toks  # long vowel from fatha + alif
    # word separator between words
    toks2 = arabic_to_tokens("كِتابٌ جَديدٌ")
    assert SEPARATOR_TOKEN in toks2
    # tanween damm -> u n
    i = toks2.index("b")
    assert toks2[i + 1 : i + 3] == ["u", "n"]


def test_tokens_to_ids_all_known():
    toks = arabic_to_tokens("مَرحَباً بِالعالَم.")
    ids = tokens_to_ids(toks)
    assert len(ids) == len(toks)
    assert all(0 <= i < 49 for i in ids)


def test_registered_in_text_processor():
    tp = TextProcessor(tokenizer="arabic-buck", add_blank=False, add_bos_eos=False,
                       normalize_text=True, languages=["ar"])
    with pytest.warns(UserWarning):
        ids, clean = tp("مَرحَباً", lang="ar", split_sentences=True)
    assert len(ids) > 0
