"""Pack a preprocessed dataset into the native arena format.

Usage:
    python -m optispeech_tpu.cli.pack FILELIST OUTPUT.pak [--config default]
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Pack datafiles into the mmap arena format")
    p.add_argument("filelist")
    p.add_argument("output")
    p.add_argument("--config", default="default")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from ..data.packed import pack_dataset
    from ..utils.yamlcfg import load_experiment

    cfg = load_experiment(args.config, args.overrides)
    pack_dataset(
        args.filelist, args.output,
        n_feats=cfg.generator.features.n_feats,
        hop_length=cfg.generator.features.hop_length,
    )


if __name__ == "__main__":
    main()
