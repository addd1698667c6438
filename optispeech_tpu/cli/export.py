"""Export CLI (reference: python -m optispeech.onnx.export).

Usage:
    python -m optispeech_tpu.cli.export CKPT_DIR OUT_DIR [--text-buckets 32,64,128]
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Export an inference artifact (StableHLO graphs + metadata)")
    p.add_argument("checkpoint", help="inference checkpoint directory")
    p.add_argument("output_dir")
    p.add_argument("--text-buckets", default="32,64,128")
    p.add_argument("--frames-per-token", type=int, default=12)
    p.add_argument("--batch-sizes", default="1,2,4,8",
                   help="power-of-two batch rung ladder for serving coalescing")
    p.add_argument("--stream-chunk-frames", type=int, default=256,
                   help="frames per /stream window (0 skips stream graphs)")
    args = p.parse_args(argv)

    from ..export.exporter import export_model
    from ..models.optispeech import OptiSpeech

    model = OptiSpeech.load_from_checkpoint(args.checkpoint)
    export_model(
        model, args.output_dir,
        text_buckets=[int(b) for b in args.text_buckets.split(",")],
        frames_per_token=args.frames_per_token,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        stream_chunk_frames=args.stream_chunk_frames or None,
    )


if __name__ == "__main__":
    main()
