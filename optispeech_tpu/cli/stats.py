"""Data statistics CLI
(reference: python -m optispeech.tools.generate_data_statistics).

Usage:
    python -m optispeech_tpu.cli.stats --config default [-o stats.json]
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Compute dataset normalization statistics")
    p.add_argument("--config", default="default")
    p.add_argument("-o", "--output-file", default="stats.json")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from ..data.datamodule import BucketedCollate, DataLoader, TextWavDataset
    from ..data.statistics import calculate_data_statistics, write_stats
    from ..utils.yamlcfg import load_experiment

    cfg = load_experiment(args.config, args.overrides)
    ds = TextWavDataset(cfg.data.train_filelist_path, f_min=cfg.generator.features.f_min)
    collate = BucketedCollate(
        n_feats=cfg.generator.features.n_feats,
        statistics=cfg.data.statistics,
        hop_length=cfg.generator.features.hop_length,
        do_normalize=False,  # statistics come from raw features
    )
    loader = DataLoader(ds, args.batch_size, collate, shuffle=False, drop_last=False)
    stats = calculate_data_statistics(loader)
    write_stats(stats, args.output_file)


if __name__ == "__main__":
    main()
