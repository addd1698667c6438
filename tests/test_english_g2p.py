"""English G2P fixture tests (VERDICT r3 item 4).

Role of reference text/tokenizers.py:84-98 (espeak IPA path) without the
piper_phonemize binding: the pronunciations below are General American,
checked segmentally (stress marks stripped) for rule-derived words and with
stress for curated lexicon words.
"""

import re

import pytest

from optispeech_tpu.text import symbols
from optispeech_tpu.text.english import (
    expand_text,
    g2p_word,
    number_to_words,
    ordinal_to_words,
    phonemize_english,
)
from optispeech_tpu.text.tokenizers import BaseTokenizer

_STRESS = re.compile("[ˈˌ]")


def seg(s):
    return _STRESS.sub("", s)


# ---------------------------------------------------------------------------
# 1. Lexicon words (function words + irregulars) — exact, with stress
# ---------------------------------------------------------------------------

LEXICON_FIXTURE = {
    "the": "ðə", "of": "ˈʌv", "one": "wˈʌn", "two": "tˈuː",
    "was": "wˈɑːz", "says": "sˈɛz", "said": "sˈɛd", "women": "wˈɪmɪn",
    "busy": "bˈɪziː", "people": "pˈiːpəl", "friend": "fɹˈɛnd",
    "enough": "ɪnˈʌf", "through": "θɹˈuː", "though": "ðˈoʊ",
    "thought": "θˈɔːt", "colonel": "kˈɜːnəl", "island": "ˈaɪlənd",
    "answer": "ˈænsɚ", "listen": "lˈɪsən", "sword": "sˈɔːɹd",
    "climb": "klˈaɪm", "doubt": "dˈaʊt", "debt": "dˈɛt",
    "honest": "ˈɑːnəst", "hour": "ˈaʊɚ", "machine": "məʃˈiːn",
    "police": "pəlˈiːs", "sure": "ʃˈʊɹ", "sugar": "ʃˈʊɡɚ",
    "woman": "wˈʊmən", "once": "wˈʌns", "eye": "ˈaɪ",
    "heart": "hˈɑːɹt", "blood": "blˈʌd", "vision": "vˈɪʒən",
    "measure": "mˈɛʒɚ", "usual": "jˈuːʒuːəl", "laugh": "lˈæf",
    "tough": "tˈʌf", "cough": "kˈɔːf", "daughter": "dˈɔːtɚ",
    "caught": "kˈɔːt", "weight": "wˈeɪt", "height": "hˈaɪt",
    "either": "ˈiːðɚ", "couple": "kˈʌpəl", "trouble": "tɹˈʌbəl",
    "country": "kˈʌntɹiː", "cousin": "kˈʌzən", "double": "dˈʌbəl",
    "young": "jˈʌŋ", "touch": "tˈʌtʃ", "month": "mˈʌnθ",
    "money": "mˈʌniː", "love": "lˈʌv", "move": "mˈuːv",
    "water": "wˈɔːtɚ", "many": "mˈɛniː", "any": "ˈɛniː",
    "only": "ˈoʊnliː", "very": "vˈɛɹiː", "pretty": "pɹˈɪtiː",
    "great": "ɡɹˈeɪt", "break": "bɹˈeɪk", "bear": "bˈɛɹ",
    "wear": "wˈɛɹ", "head": "hˈɛd", "bread": "bɹˈɛd",
    "dead": "dˈɛd", "world": "wˈɜːld", "work": "wˈɜːk",
    "word": "wˈɜːd", "early": "ˈɜːliː", "earth": "ˈɜːθ",
    "heard": "hˈɜːd", "learn": "lˈɜːn", "food": "fˈuːd",
    "foot": "fˈʊt", "door": "dˈɔːɹ", "floor": "flˈɔːɹ",
    "poor": "pˈʊɹ", "half": "hˈæf", "talk": "tˈɔːk",
    "walk": "wˈɔːk", "iron": "ˈaɪɚn", "often": "ˈɔːfən",
    "castle": "kˈæsəl", "christmas": "kɹˈɪsməs", "stomach": "stˈʌmək",
    "ocean": "ˈoʊʃən", "idea": "aɪdˈiːə", "beautiful": "bjˈuːtəfəl",
    "house": "hˈaʊs", "horse": "hˈɔːɹs", "minute": "mˈɪnət",
    "during": "dˈʊɹɪŋ", "true": "tɹˈuː", "blue": "blˈuː",
    "shoe": "ʃˈuː", "garage": "ɡɚˈɑːʒ", "genre": "ʒˈɑːnɹə",
    "yacht": "jˈɑːt", "quay": "kˈiː", "suite": "swˈiːt",
    "don't": "dˈoʊnt", "can't": "kˈænt", "won't": "wˈoʊnt",
    "i'm": "ˈaɪm", "it's": "ˈɪts", "you're": "jˈʊɹ",
}

# ---------------------------------------------------------------------------
# 2. Rule-derived words — segmental (stress-insensitive) check
# ---------------------------------------------------------------------------

RULE_FIXTURE = {
    "cat": "kæt", "dog": "dɑːɡ", "make": "meɪk", "time": "taɪm",
    "five": "faɪv", "nine": "naɪn", "home": "hoʊm", "bone": "boʊn",
    "cute": "kjuːt", "tube": "tuːb", "nation": "neɪʃən",
    "station": "steɪʃən", "table": "teɪbəl", "able": "eɪbəl",
    "speech": "spiːtʃ", "teach": "tiːtʃ", "see": "siː", "tree": "tɹiː",
    "rain": "ɹeɪn", "day": "deɪ", "play": "pleɪ", "law": "lɔː",
    "auto": "ɔːtoʊ", "boat": "boʊt", "road": "ɹoʊd", "show": "ʃoʊ",
    "low": "loʊ", "out": "aʊt", "loud": "laʊd", "boy": "bɔɪ",
    "oil": "ɔɪl", "book": "bʊk", "look": "lʊk", "good": "ɡʊd",
    "moon": "muːn", "soon": "suːn", "bird": "bɜːd", "first": "fɜːst",
    "turn": "tɜːn", "burn": "bɜːn", "hard": "hɑːɹd", "car": "kɑːɹ",
    "start": "stɑːɹt", "fork": "fɔːɹk", "north": "nɔːɹθ",
    "think": "θɪŋk", "thin": "θɪn", "this": "ðɪs", "then": "ðɛn",
    "sing": "sɪŋ", "ring": "ɹɪŋ", "finger": "fɪŋɡɚ", "thank": "θæŋk",
    "quick": "kwɪk", "queen": "kwiːn", "know": "noʊ", "knife": "naɪf",
    "write": "ɹaɪt", "wrong": "ɹɔːŋ", "school": "skuːl",
    "phone": "foʊn", "graph": "ɡɹæf", "change": "tʃeɪndʒ",
    "charge": "tʃɑːɹdʒ", "gem": "dʒɛm", "magic": "mædʒɪk",
    "city": "sɪtiː", "cent": "sɛnt", "nice": "naɪs", "face": "feɪs",
    "happy": "hæpiː", "funny": "fʌniː", "my": "maɪ", "why": "waɪ",
    "style": "staɪl", "type": "taɪp", "system": "sɪstɛm",
    "few": "fjuː", "new": "nuː", "grew": "ɡɹuː", "night": "naɪt",
    "light": "laɪt", "high": "haɪ", "sign": "saɪn", "child": "tʃaɪld",
    "cold": "koʊld", "old": "oʊld", "long": "lɔːŋ", "song": "sɔːŋ",
    "running": "ɹʌnɪŋ", "played": "pleɪd", "baked": "beɪkt",
    "wanted": "wɑːntɪd", "churches": "tʃɜːtʃɪz", "makes": "meɪks",
    "gives": "ɡɪvz", "dogs": "dɑːɡz", "cats": "kæts",
    "nature": "nætʃɚ", "picture": "pɪktʃɚ", "question": "kwɛstʃən",
    "special": "spɛʃəl", "social": "soʊʃəl", "could": "kʊd",
    "group": "ɡɹuːp", "soup": "suːp", "about": "əbaʊt",
    "around": "əɹaʊnd", "away": "əweɪ", "alone": "əloʊn",
    "stories": "stɔːɹiːz", "goes": "ɡoʊz", "babies": "beɪbiːz",
    "morning": "mɔːɹnɪŋ", "jump": "dʒʌmp", "fox": "fɑːks",
    "box": "bɑːks", "zoo": "zuː", "voice": "vɔɪs", "join": "dʒɔɪn",
}


def test_lexicon_fixture():
    bad = {w: g2p_word(w) for w, want in LEXICON_FIXTURE.items() if g2p_word(w) != want}
    assert not bad, f"{len(bad)} lexicon mismatches: {bad}"


def test_rule_fixture():
    bad = {
        w: seg(g2p_word(w))
        for w, want in RULE_FIXTURE.items()
        if seg(g2p_word(w)) != want
    }
    assert not bad, f"{len(bad)}/{len(RULE_FIXTURE)} rule mismatches: {bad}"


def test_fixture_size():
    assert len(LEXICON_FIXTURE) + len(RULE_FIXTURE) >= 200


def test_all_output_symbols_in_inventory():
    corpus = (
        "The quick brown fox jumps over the lazy dog. She sells 42 seashells "
        "by the 3rd seashore; it costs $5.50 & takes 100% effort! "
        "Don't you think Mr. Smith's answers were extraordinary?"
    )
    ipa = phonemize_english(corpus)
    missing = {ch for ch in ipa if ch not in symbols.SYMBOL_TO_ID}
    assert not missing, f"symbols outside inventory: {missing}"


def test_possessive_and_clitics():
    assert g2p_word("john's").endswith("z")
    assert g2p_word("cat's").endswith("s")
    assert seg(g2p_word("church's")).endswith("ɪz")
    assert g2p_word("couldn't") == g2p_word("could") + "ənt"
    assert g2p_word("we'll") == g2p_word("we") + "əl"


def test_number_expansion():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(115) == "one hundred fifteen"
    assert number_to_words(3042) == "three thousand forty two"
    assert number_to_words(1_000_000) == "one million"
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(23) == "twenty third"
    assert expand_text("It is 9:05").startswith("It is nine")
    assert "dollars" in expand_text("$5")
    assert "percent" in expand_text("42%")


def test_tokenizer_registered_and_round_trips():
    cls = BaseTokenizer.get_tokenizer_by_name("en-g2p")
    tok = cls(add_blank=False, add_bos_eos=True, normalize_text=True)
    ids, norm = tok("Hello world. How are you?", "en-us", split_sentences=True)
    assert isinstance(ids, list) and len(ids) == 2  # two sentences
    for sent in ids:
        assert sent[0] == symbols.BOS_ID and sent[-1] == symbols.EOS_ID
        assert all(0 <= i < len(symbols.SYMBOLS) for i in sent)
    flat, _ = tok("Hello world. How are you?", "en-us", split_sentences=False)
    assert isinstance(flat[0], int)

    # deterministic
    ids2, _ = tok("Hello world. How are you?", "en-us", split_sentences=True)
    assert ids == ids2


def test_text_processor_metadata_round_trip():
    """export metadata path: asdict -> from_dict rebuilds the same frontend."""
    from optispeech_tpu.text import TextProcessor

    tp = TextProcessor(tokenizer="en-g2p", add_blank=False, add_bos_eos=False,
                       normalize_text=True, languages=["en-us"])
    tp2 = TextProcessor.from_dict(tp.asdict())
    ids1, _ = tp("The quick brown fox cost $42.")
    ids2, _ = tp2("The quick brown fox cost $42.")
    assert ids1 == ids2 and len(ids1) > 10


def test_unknown_word_still_produces_phonemes():
    # out-of-lexicon invented words go through the letter-to-sound rules
    for w in ("blorf", "trazzle", "quint", "sprocketize"):
        out = g2p_word(w)
        assert out and all(ch in symbols.SYMBOL_TO_ID for ch in out), (w, out)
