"""Model zoo CLI: list and download exported artifacts from a remote index.

Capability parity with the reference's `ospeech-models` console script
(/root/reference/ospeech/ospeech/models.py:16-121): `ls` fetches a models.json
index, `download` streams one model into a directory. The reference hardcodes
its HuggingFace ONNX zoo; this framework's artifacts are jax.export StableHLO
directories, so the zoo base URL is configurable ($OPTISPEECH_TPU_MODEL_ZOO or
--zoo-url) and the index format is:

    {"models": [{"id": ..., "name": ..., "lang": ..., "files": [subpaths]}]}

Network access uses only the standard library (no mureq/requests dependency).

Usage:
    ospeech-tpu-models ls
    ospeech-tpu-models download MODEL_ID OUTPUT_DIR
"""

import argparse
import json
import os
import urllib.request
from pathlib import Path

DEFAULT_ZOO = "https://huggingface.co/mush42/optispeech-tpu/resolve/main/"
CHUNK = 1024 * 1024


def _zoo_url(cli_value=None) -> str:
    url = cli_value or os.environ.get("OPTISPEECH_TPU_MODEL_ZOO", DEFAULT_ZOO)
    return url if url.endswith("/") else url + "/"


def get_models(zoo_url: str) -> list[dict]:
    with urllib.request.urlopen(zoo_url + "models.json", timeout=30) as resp:
        index = json.load(resp)
    return index["models"]


def list_models(zoo_url: str):
    models = get_models(zoo_url)
    width = max([len(m["id"]) for m in models] + [8])
    print(f"{'ID':<{width}} | {'LANG':<8} | NAME")
    print("-" * (width + 30))
    for m in models:
        print(f"{m['id']:<{width}} | {m.get('lang', '?'):<8} | {m.get('name', '')}")


def download_model(zoo_url: str, model_id: str, out_dir: str):
    models = {m["id"]: m for m in get_models(zoo_url)}
    if model_id not in models:
        raise SystemExit(
            f"unknown model id `{model_id}`; run `ospeech-tpu-models ls` "
            f"(available: {', '.join(sorted(models))})"
        )
    model = models[model_id]
    dest = (Path(out_dir) / model_id).resolve()
    dest.mkdir(parents=True, exist_ok=True)
    for subpath in model["files"]:
        url = zoo_url + subpath
        # preserve the artifact's directory layout; reject index entries that
        # would escape dest (path traversal via ../ or absolute subpaths)
        target = (dest / subpath).resolve()
        if dest != target and dest not in target.parents:
            raise SystemExit(f"refusing to write outside {dest}: index subpath `{subpath}`")
        target.parent.mkdir(parents=True, exist_ok=True)
        print(f"downloading {url} -> {target}")
        with urllib.request.urlopen(url, timeout=60) as resp, open(target, "wb") as f:
            while chunk := resp.read(CHUNK):
                f.write(chunk)
    print(f"Model `{model_id}` downloaded to {dest}")
    return str(dest)


def main(argv=None):
    p = argparse.ArgumentParser(description="OptiSpeech-TPU model zoo")
    p.add_argument("--zoo-url", default=None,
                   help="zoo base URL (default $OPTISPEECH_TPU_MODEL_ZOO)")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("ls", help="list available models")
    dl = sub.add_parser("download", help="download a model")
    dl.add_argument("id", help="model id (see `ls`)")
    dl.add_argument("dir", help="directory to download the model to")
    args = p.parse_args(argv)

    zoo = _zoo_url(args.zoo_url)
    try:
        if args.cmd == "ls":
            list_models(zoo)
        else:
            download_model(zoo, args.id, args.dir)
    except (urllib.error.URLError, TimeoutError) as e:
        raise SystemExit(f"cannot reach model zoo at {zoo}: {e}")


if __name__ == "__main__":
    main()
