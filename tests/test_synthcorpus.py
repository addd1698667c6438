"""Formant-synthesis corpus generator: the substrate for end-to-end
multi-speaker / multi-language training campaigns (VERDICT r2 item 1)."""

import numpy as np

from optispeech_tpu.config import FeatureConfig
from optispeech_tpu.data.synthcorpus import (
    DEFAULT_LANGUAGES,
    DEFAULT_SPEAKERS,
    generate_corpus,
    random_text,
    synth_utterance,
)


def test_speakers_have_separated_f0_and_mixed_voicing():
    """Each synthetic speaker's tracked F0 lands near its assigned base and
    the speakers are mutually separable; utterances contain BOTH voiced and
    unvoiced frames so voicing F1/periodicity are non-degenerate metrics."""
    from optispeech_tpu.data.dsp import autocorr_pitch
    from scipy.signal import resample_poly

    medians = []
    rng = np.random.default_rng(0)
    for spk in DEFAULT_SPEAKERS:
        lang = DEFAULT_LANGUAGES[0]
        wav = synth_utterance(random_text(lang, rng), spk, lang, seed=5)
        w16 = resample_poly(wav.astype(np.float64), 2, 3).astype(np.float32)
        f0 = autocorr_pitch(w16, 16000, 160, len(w16) // 160, interpolate=False)
        voiced = f0[f0 > 0]
        frac = (f0 > 0).mean()
        assert 0.3 < frac < 0.95, f"{spk.name}: degenerate voicing {frac}"
        med = float(np.median(voiced))
        assert abs(med - spk.f0_base) < 0.15 * spk.f0_base, (spk.name, med)
        medians.append(med)
    # strictly increasing with the assigned bases -> per-speaker separation
    assert all(b > a * 1.15 for a, b in zip(medians, medians[1:])), medians


def test_f0_jitter_moves_within_speaker_pitch():
    """`f0_scale` shifts the tracked F0 multiplicatively (so per-utterance
    lognormal jitter creates within-speaker spread — the property that keeps
    the pitch pathway load-bearing, campaign_r3 layer 3), while f0_scale=1
    reproduces the fixed-F0 corpus exactly."""
    from optispeech_tpu.data.dsp import autocorr_pitch
    from scipy.signal import resample_poly

    spk, lang = DEFAULT_SPEAKERS[1], DEFAULT_LANGUAGES[0]
    text = "dake mito nasebo"

    def med(f0_scale):
        wav = synth_utterance(text, spk, lang, seed=3, f0_scale=f0_scale)
        w16 = resample_poly(wav.astype(np.float64), 2, 3).astype(np.float32)
        f0 = autocorr_pitch(w16, 16000, 160, len(w16) // 160, interpolate=False)
        return float(np.median(f0[f0 > 0]))

    base, lo, hi = med(1.0), med(0.85), med(1.18)
    assert abs(lo / base - 0.85) < 0.05, (lo, base)
    assert abs(hi / base - 1.18) < 0.06, (hi, base)
    default = synth_utterance(text, spk, lang, seed=3)
    assert np.array_equal(default, synth_utterance(text, spk, lang, seed=3,
                                                   f0_scale=1.0))


def test_generate_corpus_records_f0_scales(tmp_path):
    """Per-utterance scales land in the manifest; jitter=0 pins them to 1."""
    m = generate_corpus(str(tmp_path / "j"), n_utterances=6, seed=1,
                        f0_jitter=0.08)
    scales = np.array(list(m["f0_scales"].values()))
    assert len(scales) == 6 and scales.std() > 0.01
    assert np.all((scales > 0.7) & (scales < 1.4))
    m0 = generate_corpus(str(tmp_path / "nj"), n_utterances=4, seed=1,
                         f0_jitter=0.0)
    assert all(v == 1.0 for v in m0["f0_scales"].values())


def test_ipa_frontend_speakers_separated_and_voicing_mixed():
    """en-g2p frontend: real English text -> IPA -> formant audio keeps the
    per-speaker F0 separation and non-degenerate voicing the campaign's
    checks rely on."""
    from optispeech_tpu.data.dsp import autocorr_pitch
    from optispeech_tpu.data.synthcorpus import synth_utterance_ipa
    from optispeech_tpu.text.english import phonemize_english
    from scipy.signal import resample_poly

    ipa = phonemize_english("the quick brown fox jumps over the lazy dog")
    medians = []
    for spk in DEFAULT_SPEAKERS:
        wav = synth_utterance_ipa(ipa, spk, DEFAULT_LANGUAGES[0], seed=5)
        w16 = resample_poly(wav.astype(np.float64), 2, 3).astype(np.float32)
        f0 = autocorr_pitch(w16, 16000, 160, len(w16) // 160, interpolate=False)
        voiced = f0[f0 > 0]
        frac = (f0 > 0).mean()
        assert 0.3 < frac < 0.97, f"{spk.name}: degenerate voicing {frac}"
        med = float(np.median(voiced))
        assert abs(med - spk.f0_base) < 0.15 * spk.f0_base, (spk.name, med)
        medians.append(med)
    assert all(b > a * 1.15 for a, b in zip(medians, medians[1:])), medians


def test_ipa_frontend_corpus_preprocesses_with_en_g2p_tokenizer(tmp_path):
    """generate_corpus(frontend='en-g2p') + the en-g2p tokenizer run through
    the full preprocess pipeline (the round-4 campaign path)."""
    from optispeech_tpu.data.preprocess import FeatureExtractor, preprocess_dataset
    from optispeech_tpu.text import TextProcessor
    from optispeech_tpu.config import TextProcessorConfig

    out = tmp_path / "corpus"
    manifest = generate_corpus(str(out), n_utterances=8, seed=0, frontend="en-g2p")
    assert manifest["frontend"] == "en-g2p"
    # texts are real English words
    lines = (out / "metadata.csv").read_text().strip().splitlines()
    assert all(t.split("|")[3].replace(" ", "").isalpha() for t in lines)

    tp = TextProcessor.from_config(TextProcessorConfig(
        tokenizer="en-g2p", languages=("en-us", "de")))
    fe = FeatureExtractor(features=FeatureConfig(), pitch_extractor="autocorr")
    train, val = preprocess_dataset(str(out), str(tmp_path / "pre"), tp, fe,
                                    val_fraction=0.25, num_workers=1)
    assert len(train) + len(val) == 8
    import json

    one = json.load(open(train[0] + ".json"))
    assert len(one["phoneme_ids"]) > 5


def test_generate_corpus_layout_and_preprocess_compat(tmp_path):
    """metadata.csv is the 4-column layout cli/preprocess.py consumes and the
    full preprocess pipeline runs on it (sid/lid maps included)."""
    out = tmp_path / "corpus"
    manifest = generate_corpus(str(out), n_utterances=8, seed=0)
    assert manifest["n_utterances"] == 8
    lines = (out / "metadata.csv").read_text().strip().splitlines()
    assert len(lines) == 8
    assert all(len(l.split("|")) == 4 for l in lines)

    from optispeech_tpu.data.preprocess import (
        FeatureExtractor,
        get_sids_and_lids,
        parse_metadata,
        preprocess_dataset,
    )
    from optispeech_tpu.text import TextProcessor
    from optispeech_tpu.config import TextProcessorConfig

    rows = parse_metadata(out / "metadata.csv")
    sid_map, lid_map = get_sids_and_lids(rows)
    assert len(sid_map) == 4 and len(lid_map) == 2

    tp = TextProcessor.from_config(TextProcessorConfig(
        tokenizer="char", languages=("en-us", "de")))
    fe = FeatureExtractor(features=FeatureConfig(), pitch_extractor="autocorr")
    train, val = preprocess_dataset(str(out), str(tmp_path / "pre"), tp, fe,
                                    val_fraction=0.25, num_workers=1)
    assert len(train) + len(val) == 8
    import json

    one = json.load(open(train[0] + ".json"))
    assert "sid" in one and "lid" in one
    data = np.load(train[0] + ".npz")
    assert data["mel"].shape[0] == FeatureConfig().n_feats
    assert np.isfinite(data["pitch"]).all()
