"""German self-contained G2P (text/german.py, `de-g2p` tokenizer).

Role parity: the reference phonemizes any espeak language through the
piper_phonemize binding (reference text/tokenizers.py:84-98); this image has
no binding, so German follows the same self-contained-G2P pattern as English
(VERDICT r4 item 8). Fixtures give standard German citation pronunciations
(Duden/espeak conventions, coda-r vocalised to ɐ)."""

import pytest

from optispeech_tpu.text import symbols
from optispeech_tpu.text.german import (
    number_to_german,
    phonemize_german,
)
from optispeech_tpu.text.tokenizers import BaseTokenizer

# word -> expected IPA (espeak-style, stress ˈ before the stressed vowel)
FIXTURES = {
    # rule-driven regulars: vowel length
    "name": "nˈaːmə",
    "haben": "hˈaːbən",
    "boot": "bˈoːt",
    "meer": "mˈeːɐ",
    "jahr": "jˈaːɐ",
    "uhr": "ˈuːɐ",
    "mann": "mˈan",
    "wasser": "vˈasɐ",
    "kommen": "kˈɔmən",
    "mutter": "mˈʊtɐ",
    "himmel": "hˈɪməl",
    # diphthongs
    "mein": "mˈaɪn",
    "haus": "hˈaʊs",
    "heute": "hˈɔʏtə",
    "träume": "tʁˈɔʏmə",
    "mai": "mˈaɪ",
    # ie / ü / ö / ä
    "liebe": "lˈiːbə",
    "grün": "ɡʁˈyːn",
    "schön": "ʃˈøːn",
    "könnte": "kˈœntə",
    "mädchen": "mˈɛːtçən",
    "glück": "ɡlˈʏk",
    # ch contexts
    "ich": "ˈɪç",
    "nacht": "nˈaxt",
    "buch": "bˈuːx",
    "milch": "mˈɪlç",
    "richtig": "ʁˈɪçtɪç",
    "machen": "mˈaxən",
    # sibilants / clusters
    "schule": "ʃˈuːlə",
    "stein": "ʃtˈaɪn",
    "spielen": "ʃpˈiːlən",
    "straße": "ʃtʁˈaːsə",
    "zeit": "tsˈaɪt",
    "katze": "kˈatsə",
    "deutsch": "dˈɔʏtʃ",
    "sechs": "zˈɛks",
    "pferd": "pfˈeːɐt",
    "quelle": "kvˈɛlə",
    # Auslautverhärtung
    "hund": "hˈʊnt",
    "tag": "tˈaːk",
    "lieb": "lˈiːp",
    "abend": "ˈaːbənt",
    # w/v/j
    "wein": "vˈaɪn",
    "vogel": "fˈoːɡəl",
    "vater": "fˈaːtɐ",
    "jung": "jˈʊŋ",
    # unstressed prefixes shift stress
    "verstehen": "fɐʃtˈeːən",
    "gesund": "ɡəzˈʊnt",
    "erzählen": "ɐtsˈɛːlən",
    "bekommen": "bəkˈɔmən",
    # -er / -en / -el codas
    "lehrer": "lˈeːʁɐ",
    "wetter": "vˈɛtɐ",
    "garten": "ɡˈaɐtən",
    # -tion
    "station": "ʃtatsiˈoːn",
}


@pytest.mark.parametrize("word,expected", sorted(FIXTURES.items()))
def test_german_word_fixtures(word, expected):
    assert phonemize_german(word) == expected


def test_output_stays_in_symbol_inventory():
    text = ("Heute scheint die Sonne über dem großen Fluß, und die Kinder "
            "spielen fröhlich im Garten. Zweiundvierzig Vögel fliegen!")
    ipa = phonemize_german(text)
    assert ipa
    for ch in ipa:
        assert ch == " " or ch in symbols.SYMBOL_TO_ID, ch


def test_lexicon_entries_stay_in_inventory():
    from optispeech_tpu.text.german import LEXICON

    for word, ipa in LEXICON.items():
        for ch in ipa:
            assert ch in symbols.SYMBOL_TO_ID, (word, ch)


def test_number_expansion():
    assert number_to_german(0) == "null"
    assert number_to_german(7) == "sieben"
    assert number_to_german(21) == "einundzwanzig"
    assert number_to_german(42) == "zweiundvierzig"
    assert number_to_german(100) == "einhundert"
    assert number_to_german(345) == "dreihundertfünfundvierzig"
    assert number_to_german(1000) == "eintausend"
    # numbers inside text are expanded and phonemized
    ipa = phonemize_german("42 häuser")
    assert "ts" in ipa and "v" in ipa  # zwei..vierzig present


def test_de_g2p_tokenizer_round_trip():
    tok = BaseTokenizer.get_tokenizer_by_name("de-g2p")(
        add_blank=True, add_bos_eos=False, normalize_text=True
    )
    ids, norm = tok("Guten Morgen. Wie geht es dir?", "de")
    assert isinstance(ids, list) and len(ids) == 2  # two sentences
    flat, _ = tok("Guten Morgen. Wie geht es dir?", "de", split_sentences=False)
    assert all(0 <= i < len(symbols.SYMBOLS) for i in flat)
    assert len(flat) > 10
