"""Inference CLI (reference: python -m optispeech.infer, optispeech/infer.py).

Usage:
    python -m optispeech_tpu.cli.infer CKPT_DIR "Some text" OUT_DIR \
        [--d-factor F] [--p-factor F] [--e-factor F] [--no-split] [--bf16]
"""

import argparse
from pathlib import Path

from ..utils.pylogger import get_pylogger

log = get_pylogger("optispeech_tpu.infer")


def main(argv=None):
    p = argparse.ArgumentParser(description="Synthesise speech from a checkpoint")
    p.add_argument("checkpoint", help="inference checkpoint directory")
    p.add_argument("text")
    p.add_argument("output_dir")
    p.add_argument("--d-factor", type=float, default=None, help="speech rate scale")
    p.add_argument("--p-factor", type=float, default=None, help="pitch scale")
    p.add_argument("--e-factor", type=float, default=None, help="energy scale")
    p.add_argument("--language", default=None)
    p.add_argument("--speaker", default=None)
    p.add_argument("--no-split", action="store_true", help="do not split sentences")
    p.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas decoder/vocoder blocks (TPU only; "
                        "~1.7x on-device, docs/evidence/synthesis_profile.md)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..models.optispeech import OptiSpeech
    from ..utils.wavio import save_wav

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.fused:
        import dataclasses

        from ..training.checkpoint import load_inference_checkpoint

        cfg, params, meta = load_inference_checkpoint(args.checkpoint)
        g = cfg.generator
        cfg = dataclasses.replace(cfg, generator=dataclasses.replace(
            g,
            decoder=dataclasses.replace(g.decoder, fused_pallas=True),
            vocoder=dataclasses.replace(g.vocoder, fused_pallas=True),
        ))
        model = OptiSpeech(cfg, params=params, compute_dtype=dtype,
                           speakers=meta.get("speakers") or [])
    else:
        model = OptiSpeech.load_from_checkpoint(args.checkpoint, compute_dtype=dtype)
    speaker = args.speaker
    if speaker is not None and speaker.isdigit():
        speaker = int(speaker)
    inputs = model.prepare_input(
        args.text,
        language=args.language,
        speaker=speaker,
        d_factor=args.d_factor,
        p_factor=args.p_factor,
        e_factor=args.e_factor,
        split_sentences=not args.no_split,
    )
    outputs = model.synthesise(inputs)
    log.info(f"RTF: {outputs.rtf:.6f} (am {outputs.am_rtf:.6f} + voc {outputs.v_rtf:.6f})")
    log.info(f"Latency: {outputs.latency:.1f} ms")
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, wav in enumerate(outputs):
        path = out_dir / f"gen-{i + 1}.wav"
        save_wav(str(path), wav, model.sample_rate)
        log.info(f"Wrote {path}")


if __name__ == "__main__":
    main()
