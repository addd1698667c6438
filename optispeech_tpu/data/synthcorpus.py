"""Speech-like synthetic corpus generator (formant synthesis).

No reference analogue — this is the framework's self-contained way to run a
REAL multi-speaker / multi-language training campaign end-to-end (preprocess
-> stats -> pack -> GAN train -> eval -> export -> serve) without shipping a
speech dataset: utterances are additive formant synthesis with

- per-SPEAKER voice identity: F0 base + vocal-tract (formant-scale) factor,
- per-LANGUAGE phone inventories and tempo, so language ids carry signal
  beyond the character distribution,
- a deterministic character -> phone mapping (char tokenizer friendly), so
  text-to-audio alignment is learnable by a TTS model.

The audio is not speech, but it has speech's structure: voiced harmonic
segments with formant resonances, noise consonants, stop gaps, pauses,
F0 declination + vibrato, and an amplitude envelope. Pitch trackers,
voicing F1, MCD and STOI all produce meaningful (movable) values on it —
unlike the round-2 vibrato tone that saturated periodicity/F1
(VERDICT r2 weak 1/2).
"""

import dataclasses
import json
from pathlib import Path

import numpy as np

# vowel formants (F1, F2, F3) Hz — rough adult-male targets
_VOWELS = {
    "a": (800.0, 1200.0, 2500.0),
    "e": (500.0, 1900.0, 2500.0),
    "i": (300.0, 2300.0, 3000.0),
    "o": (450.0, 800.0, 2400.0),
    "u": (325.0, 700.0, 2300.0),
}
# noise consonants: (band_lo, band_hi) Hz
_FRICATIVES = {
    "s": (4000.0, 9000.0),
    "f": (2000.0, 7000.0),
    "h": (500.0, 3000.0),
    "r": (1000.0, 3500.0),
}
# stops: closure gap + short burst centred at (hz)
_STOPS = {
    "t": 4500.0, "k": 2500.0, "b": 700.0, "d": 3000.0, "p": 1200.0, "g": 2000.0,
}
# nasal-ish voiced consonants: single low resonance
_NASALS = {"m": 280.0, "n": 320.0, "l": 400.0}


@dataclasses.dataclass(frozen=True)
class Speaker:
    name: str
    f0_base: float        # Hz
    formant_scale: float  # vocal-tract length factor (1.0 = neutral)
    vibrato_hz: float = 5.0
    vibrato_depth: float = 0.015


@dataclasses.dataclass(frozen=True)
class Language:
    name: str
    consonants: str
    vowels: str
    phone_ms: float  # mean phone duration (tempo)


DEFAULT_SPEAKERS = (
    Speaker("spk_low", 110.0, 1.06),
    Speaker("spk_mid", 150.0, 1.0),
    Speaker("spk_high", 205.0, 0.88),
    Speaker("spk_top", 255.0, 0.82),
)
DEFAULT_LANGUAGES = (
    Language("en-us", consonants="bdkmnst", vowels="aeiou", phone_ms=110.0),
    Language("de", consonants="fghlpr", vowels="aiu", phone_ms=140.0),
)


def _formant_envelope(freqs: np.ndarray, formants, bandwidths=(90.0, 120.0, 160.0)):
    """|H(f)| of cascaded resonators, normalized to peak 1."""
    h = np.ones_like(freqs)
    for fc, bw in zip(formants, bandwidths):
        h = h * (bw / 2.0) ** 2 / ((freqs - fc) ** 2 + (bw / 2.0) ** 2) * 4.0
    return h / max(h.max(), 1e-9)


def _voiced_segment(n, sr, f0_curve, formants, rng):
    """Additive harmonic synthesis under a formant envelope."""
    t = np.arange(n) / sr
    phase0 = 2 * np.pi * np.cumsum(f0_curve) / sr
    n_harm = max(int((sr / 2 - 200.0) / max(f0_curve.mean(), 50.0)), 3)
    n_harm = min(n_harm, 40)
    k = np.arange(1, n_harm + 1)
    freqs = k * f0_curve.mean()
    # -6 dB/oct glottal rolloff + an envelope floor so the fundamental stays
    # prominent (pitch trackers otherwise octave-jump onto the formant peaks)
    amps = (0.35 + _formant_envelope(freqs, formants)) / k
    sig = (np.sin(phase0[:, None] * k[None, :]) * amps[None, :]).sum(axis=1)
    return sig.astype(np.float32)


def _noise_segment(n, sr, lo, hi, rng):
    noise = rng.standard_normal(n)
    spec = np.fft.rfft(noise)
    f = np.fft.rfftfreq(n, 1.0 / sr)
    gate = ((f >= lo) & (f <= hi)).astype(float)
    # soft band edges
    gate = np.convolve(gate, np.ones(9) / 9.0, mode="same")
    return np.fft.irfft(spec * gate, n).astype(np.float32) * 2.0


def _env(n, attack=0.15, release=0.2):
    e = np.ones(n)
    a, r = max(int(n * attack), 1), max(int(n * release), 1)
    e[:a] = np.linspace(0, 1, a)
    e[-r:] = np.linspace(1, 0, r)
    return e


def synth_utterance(text: str, speaker: Speaker, language: Language,
                    sr: int = 24000, seed: int = 0,
                    f0_scale: float = 1.0) -> np.ndarray:
    """Render `text` (chars from the language's inventory + spaces) to audio.

    `f0_scale` shifts the whole utterance's F0 contour off the speaker base.
    The round-3 campaign showed that when F0 is a pure function of speaker
    identity the GAN decoder can learn pitch from the sid embedding and
    ignore the pitch-embedding pathway entirely (campaign_r3/README.md layer
    3); per-utterance variation makes the pitch pathway load-bearing, like
    natural within-speaker F0 spread."""
    rng = np.random.default_rng(seed)
    pieces = []
    phones = [c for c in text]
    n_ph = max(len(phones), 1)
    for i, ch in enumerate(phones):
        progress = i / n_ph
        dur_ms = language.phone_ms * rng.uniform(0.75, 1.3)
        if i >= n_ph - 2:
            dur_ms *= 1.35  # final lengthening
        n = int(sr * dur_ms / 1000.0)
        if ch == " ":
            pieces.append(np.zeros(int(n * 0.8), np.float32))
            continue
        # F0: per-utterance scale + declination + vibrato + jitter
        f0 = speaker.f0_base * f0_scale * (1.12 - 0.2 * progress)
        t = np.arange(n) / sr
        f0_curve = f0 * (1.0
                         + speaker.vibrato_depth
                         * np.sin(2 * np.pi * speaker.vibrato_hz * t)
                         + 0.004 * rng.standard_normal(n).cumsum() / np.sqrt(n))
        if ch in _VOWELS:
            formants = tuple(f / speaker.formant_scale for f in _VOWELS[ch])
            seg = _voiced_segment(n, sr, f0_curve, formants, rng)
            seg *= _env(n, 0.12, 0.18) * 0.55
        elif ch in _FRICATIVES:
            lo, hi = _FRICATIVES[ch]
            seg = _noise_segment(n, sr, lo / speaker.formant_scale,
                                 hi / speaker.formant_scale, rng)
            seg *= _env(n, 0.3, 0.3) * 0.18
        elif ch in _STOPS:
            gap = np.zeros(int(n * 0.55), np.float32)
            nb = max(n - len(gap), 8)
            fc = _STOPS[ch] / speaker.formant_scale
            burst = _noise_segment(nb, sr, fc * 0.6, fc * 1.6, rng)
            seg = np.concatenate([gap, burst * _env(nb, 0.02, 0.7) * 0.3])
        elif ch in _NASALS:
            fc = _NASALS[ch] / speaker.formant_scale
            seg = _voiced_segment(n, sr, f0_curve, (fc, fc * 3.2, 2400.0), rng)
            seg *= _env(n, 0.2, 0.2) * 0.4
        else:  # unknown char: schwa-ish vowel
            formants = tuple(f / speaker.formant_scale for f in (500.0, 1500.0, 2500.0))
            seg = _voiced_segment(n, sr, f0_curve, formants, rng)
            seg *= _env(n, 0.15, 0.2) * 0.45
        pieces.append(seg.astype(np.float32))
    wav = np.concatenate(pieces) if pieces else np.zeros(sr // 10, np.float32)
    wav = wav + 1e-4 * rng.standard_normal(len(wav)).astype(np.float32)
    peak = np.abs(wav).max()
    return (0.7 * wav / max(peak, 1e-6)).astype(np.float32)


def random_text(language: Language, rng, n_words=(3, 7)) -> str:
    words = []
    for _ in range(rng.integers(n_words[0], n_words[1] + 1)):
        syls = []
        for _ in range(rng.integers(1, 4)):
            c = language.consonants[rng.integers(len(language.consonants))]
            v = language.vowels[rng.integers(len(language.vowels))]
            syls.append(c + v)
        words.append("".join(syls))
    return " ".join(words)


def generate_corpus(out_dir: str, n_utterances: int = 600,
                    speakers=DEFAULT_SPEAKERS, languages=DEFAULT_LANGUAGES,
                    sr: int = 24000, seed: int = 0,
                    f0_jitter: float = 0.08) -> dict:
    """Write wavs/ + 4-column metadata.csv (file_id|speaker|lang|text), the
    exact layout cli/preprocess.py consumes. Returns a manifest dict.

    `f0_jitter` is the sigma of a lognormal per-utterance F0 scale (~±16% at
    2 sigma by default): speaker medians stay separated while within-speaker
    spread forces the pitch pathway to carry signal (see synth_utterance);
    0.0 reproduces the round-3 fixed-F0 corpus. Per-utterance scales are
    recorded in the manifest for F0-check layers."""
    from ..utils.wavio import save_wav

    out = Path(out_dir)
    (out / "wavs").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    f0_scales = {}
    for i in range(n_utterances):
        spk = speakers[i % len(speakers)]
        lang = languages[(i // len(speakers)) % len(languages)]
        text = random_text(lang, rng)
        f0_scale = float(np.exp(f0_jitter * rng.standard_normal())) if f0_jitter else 1.0
        wav = synth_utterance(text, spk, lang, sr=sr, seed=seed + i,
                              f0_scale=f0_scale)
        fid = f"utt{i:05d}"
        save_wav(str(out / "wavs" / f"{fid}.wav"), wav, sr)
        rows.append(f"{fid}|{spk.name}|{lang.name}|{text}")
        f0_scales[fid] = round(f0_scale, 5)
    (out / "metadata.csv").write_text("\n".join(rows) + "\n", encoding="utf-8")
    manifest = {
        "n_utterances": n_utterances,
        "sample_rate": sr,
        "speakers": {s.name: {"f0_base": s.f0_base, "formant_scale": s.formant_scale}
                     for s in speakers},
        "languages": [l.name for l in languages],
        "seed": seed,
        "f0_jitter": f0_jitter,
        "f0_scales": f0_scales,
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return manifest


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Generate a formant-synthesis speech-like corpus")
    p.add_argument("out_dir")
    p.add_argument("--n-utterances", type=int, default=600)
    p.add_argument("--sample-rate", type=int, default=24000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--f0-jitter", type=float, default=0.08,
                   help="sigma of the lognormal per-utterance F0 scale "
                        "(0 = fixed per-speaker F0, the round-3 corpus)")
    args = p.parse_args(argv)
    m = generate_corpus(args.out_dir, args.n_utterances, sr=args.sample_rate,
                        seed=args.seed, f0_jitter=args.f0_jitter)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
