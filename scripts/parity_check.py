"""Mel-L1 parity check against a reference PyTorch checkpoint.

BASELINE.md north star: mel-spectrogram L1 <= 1e-2 vs the torch reference
checkpoint. Given a reference Lightning .ckpt (e.g. from
huggingface.co/mush42/optispeech — not downloadable in this offline image),
this imports the generator weights (optispeech_tpu/compat/torch_import.py),
synthesises the same phoneme sequence with fixed durations through both-
framework-identical deterministic paths, and reports the log-mel L1 between
the generated waveforms' spectra.

Usage:
    python scripts/parity_check.py CKPT.ckpt --config default \
        [--ids "23,45,67,..."] [--d-factor 1.0]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="reference Lightning .ckpt path")
    p.add_argument("--config", default="default")
    p.add_argument("--ids", default=None, help="comma-separated phoneme ids")
    p.add_argument("--text", default="Parity check sentence.", help="text (needs espeak)")
    p.add_argument("--d-factor", type=float, default=1.0)
    args = p.parse_args()

    import jax.numpy as jnp

    from optispeech_tpu.compat.torch_import import load_torch_checkpoint
    from optispeech_tpu.data.dsp import log_mel_spectrogram_np
    from optispeech_tpu.models.optispeech import OptiSpeech
    from optispeech_tpu.utils.yamlcfg import load_experiment
    from optispeech_tpu.values import InferenceInputs

    cfg = load_experiment(args.config)
    params = load_torch_checkpoint(args.checkpoint, cfg.generator)
    api = OptiSpeech(cfg, params=params)

    if args.ids:
        ids = [int(i) for i in args.ids.split(",")]
        inputs = InferenceInputs.from_ids_and_lengths(
            ids=[ids], lengths=[len(ids)], clean_text="ids",
            d_factor=args.d_factor, p_factor=1.0, e_factor=1.0,
        )
    else:
        inputs = api.prepare_input(args.text, d_factor=args.d_factor,
                                   p_factor=1.0, e_factor=1.0, split_sentences=False)
    ours = api.synthesise(inputs)
    wav_ours = np.asarray(ours.wav)[0][: int(ours.wav_lengths[0])]

    # torch side: run the reference checkpoint if the reference package is
    # importable; otherwise expect a precomputed wav next to the ckpt
    ref_wav_path = Path(args.checkpoint).with_suffix(".ref.wav")
    if ref_wav_path.exists():
        from optispeech_tpu.utils.wavio import load_wav

        wav_ref, _ = load_wav(str(ref_wav_path), sr=cfg.generator.features.sample_rate)
    else:
        raise SystemExit(
            f"Place the reference synthesis of the same input at {ref_wav_path} "
            "(generated with the torch reference via `python -m optispeech.infer`), "
            "then re-run."
        )

    n = min(len(wav_ours), len(wav_ref))
    f = cfg.generator.features
    mel_a = log_mel_spectrogram_np(wav_ours[:n], f.sample_rate, f.n_fft, f.hop_length,
                                   f.win_length, f.n_feats, f.f_min, f.f_max)
    mel_b = log_mel_spectrogram_np(np.asarray(wav_ref[:n]), f.sample_rate, f.n_fft,
                                   f.hop_length, f.win_length, f.n_feats, f.f_min, f.f_max)
    l1 = float(np.mean(np.abs(mel_a - mel_b)))
    print(f"mel-L1: {l1:.6f}  (target <= 1e-2)")
    print("PASS" if l1 <= 1e-2 else "FAIL")


if __name__ == "__main__":
    main()
