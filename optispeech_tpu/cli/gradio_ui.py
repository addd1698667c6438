"""Gradio demo UI over an exported artifact.

Capability parity with the reference's web demo
(/root/reference/scripts/gradio_ui.py and ospeech/ospeech/gradio_ui.py:94-100,
console script `ospeech-gradio`): text box + d/p/e sliders -> audio player.
Import-gated — gradio is an optional dependency (reference puts it behind the
`[gradio]` extra, ospeech/pyproject.toml:22-24).

Usage:
    ospeech-tpu-gradio ARTIFACT_DIR [--host 0.0.0.0 --port 7860 --share]
        [--char-limit N]
"""

import argparse


def build_ui(model, char_limit=None):
    import gradio as gr

    def speak(text, speaker, d_factor, p_factor, e_factor):
        if char_limit:
            text = text[:char_limit]
        inputs = model.prepare_input(
            text, speaker=(speaker or None), split_sentences=True,
            d_factor=d_factor, p_factor=p_factor, e_factor=e_factor,
        )
        out = model.synthesise(inputs)
        import numpy as np

        wav = np.concatenate([w.squeeze() for w in out.unbatched_wavs()])
        return (model.sample_rate, wav), f"RTF: {out.rtf:.4f}  latency: {out.latency:.0f} ms"

    speakers = getattr(model, "speakers", None) or []
    with gr.Blocks(title="OptiSpeech-TPU") as ui:
        text = gr.Textbox(label="Text", lines=3)
        speaker = (gr.Dropdown(speakers, label="Speaker", value=speakers[0])
                   if speakers else gr.Textbox(visible=False))
        d = gr.Slider(0.5, 2.0, value=1.0, label="Rate (d_factor)")
        p = gr.Slider(0.5, 2.0, value=1.0, label="Pitch (p_factor)")
        e = gr.Slider(0.5, 2.0, value=1.0, label="Energy (e_factor)")
        audio = gr.Audio(label="Output")
        stats = gr.Textbox(label="Stats", interactive=False)
        gr.Button("Speak").click(speak, [text, speaker, d, p, e], [audio, stats])
    return ui


def main(argv=None):
    p = argparse.ArgumentParser(description="Gradio demo for an exported OptiSpeech-TPU artifact")
    p.add_argument("artifact", help="exported artifact directory")
    p.add_argument("-s", "--share", action="store_true", help="generate gradio share link")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--char-limit", type=int, default=None)
    args = p.parse_args(argv)

    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed; `pip install gradio` to use the demo UI "
            "(the reference gates it behind the [gradio] extra too)"
        )
    from ..export.exporter import ExportedOptiSpeech

    model = ExportedOptiSpeech(args.artifact)
    build_ui(model, args.char_limit).launch(
        server_name=args.host, server_port=args.port, share=args.share
    )


if __name__ == "__main__":
    main()
