"""Gradio demo UI (reference: scripts/gradio_ui.py — checkpoint-watching demo).

Usage:
    python -m optispeech_tpu.cli.demo CKPT_DIR [--port 7860]

Requires the optional `gradio` package.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Web demo for an OptiSpeech-TPU checkpoint")
    p.add_argument("checkpoint")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "The demo requires the optional `gradio` package (pip install gradio)."
        )

    from ..models.optispeech import OptiSpeech

    model = OptiSpeech.load_from_checkpoint(args.checkpoint)

    def tts(text, d_factor, p_factor, e_factor):
        inputs = model.prepare_input(
            text, d_factor=d_factor, p_factor=p_factor, e_factor=e_factor,
            split_sentences=True,
        )
        out = model.synthesise(inputs)
        import numpy as np

        wav = np.concatenate(list(out))
        info = f"RTF {out.rtf:.4f} | latency {out.latency:.0f} ms"
        return (model.sample_rate, wav), info

    demo = gr.Interface(
        fn=tts,
        inputs=[
            gr.Textbox(label="Text"),
            gr.Slider(0.5, 2.0, value=model.inference_args.d_factor, label="Duration factor"),
            gr.Slider(0.5, 2.0, value=model.inference_args.p_factor, label="Pitch factor"),
            gr.Slider(0.5, 2.0, value=model.inference_args.e_factor, label="Energy factor"),
        ],
        outputs=[gr.Audio(label="Audio"), gr.Textbox(label="Stats")],
        title="OptiSpeech-TPU",
    )
    demo.launch(server_port=args.port, share=args.share)


if __name__ == "__main__":
    main()
