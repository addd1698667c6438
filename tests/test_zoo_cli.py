"""Model-zoo CLI (ospeech-tpu-models) against a local file:// zoo."""

import json

import pytest

from optispeech_tpu.cli.models import download_model, get_models, main


def _make_zoo(tmp_path):
    zoo = tmp_path / "zoo"
    (zoo / "en" / "tiny").mkdir(parents=True)
    (zoo / "en" / "tiny" / "params.pkl").write_bytes(b"weights")
    (zoo / "en" / "tiny" / "metadata.json").write_text("{}")
    (zoo / "models.json").write_text(json.dumps({
        "models": [{
            "id": "en-tiny-demo", "name": "tiny-demo", "lang": "en",
            "files": ["en/tiny/params.pkl", "en/tiny/metadata.json"],
        }],
    }))
    return zoo.as_uri() + "/"


def test_zoo_list_and_download(tmp_path, capsys):
    url = _make_zoo(tmp_path)
    models = get_models(url)
    assert models[0]["id"] == "en-tiny-demo"

    main(["--zoo-url", url, "ls"])
    assert "en-tiny-demo" in capsys.readouterr().out

    dest = download_model(url, "en-tiny-demo", str(tmp_path / "dl"))
    # nested artifact layouts are reproduced, not flattened to basenames
    root = tmp_path / "dl" / "en-tiny-demo"
    assert (root / "en" / "tiny" / "params.pkl").read_bytes() == b"weights"
    assert (root / "en" / "tiny" / "metadata.json").exists()
    assert dest.endswith("en-tiny-demo")


def test_zoo_unknown_model_errors(tmp_path):
    url = _make_zoo(tmp_path)
    with pytest.raises(SystemExit, match="unknown model id"):
        download_model(url, "nope", str(tmp_path / "dl"))


def test_zoo_rejects_path_traversal(tmp_path):
    zoo = tmp_path / "zoo"
    zoo.mkdir()
    (zoo / "models.json").write_text(json.dumps({
        "models": [{"id": "evil", "files": ["../../escape.bin"]}],
    }))
    with pytest.raises(SystemExit, match="outside"):
        download_model(zoo.as_uri() + "/", "evil", str(tmp_path / "dl"))
    assert not (tmp_path / "escape.bin").exists()


def test_gradio_ui_gated():
    from optispeech_tpu.cli.gradio_ui import main as gr_main

    try:
        import gradio  # noqa: F401
        pytest.skip("gradio installed; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(SystemExit, match="gradio is not installed"):
        gr_main(["/nonexistent"])
