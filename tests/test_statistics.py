"""Dataset statistics vs a direct numpy oracle (reference
generate_data_statistics capability)."""

import numpy as np

from optispeech_tpu.config import DataStatistics
from optispeech_tpu.data.datamodule import BucketedCollate, DataLoader, SyntheticDataset
from optispeech_tpu.data.statistics import calculate_data_statistics


def test_statistics_match_numpy_oracle():
    ds = SyntheticDataset(n_items=16, n_feats=20, hop_length=64, seed=3)
    collate = BucketedCollate(n_feats=20, statistics=DataStatistics(), hop_length=64,
                              text_bucket=16, mel_bucket=32, do_normalize=False)
    loader = DataLoader(ds, 4, collate, shuffle=False, drop_last=False)
    stats = calculate_data_statistics(loader)

    # oracle over raw items (valid frames only)
    pitches = np.concatenate([ds[i]["pitch"] for i in range(16)])
    energies = np.concatenate([ds[i]["energy"] for i in range(16)])
    mels = np.concatenate([ds[i]["mel"].ravel() for i in range(16)])
    np.testing.assert_allclose(stats["pitch_mean"], pitches.mean(), rtol=1e-4)
    np.testing.assert_allclose(stats["pitch_std"], pitches.std(), rtol=1e-3)
    np.testing.assert_allclose(stats["pitch_min"], pitches.min(), rtol=1e-4)
    np.testing.assert_allclose(stats["pitch_max"], pitches.max(), rtol=1e-4)
    np.testing.assert_allclose(stats["energy_mean"], energies.mean(), rtol=1e-4)
    np.testing.assert_allclose(stats["mel_mean"], mels.mean(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(stats["mel_std"], mels.std(), rtol=1e-3)


def test_char_tokenizer_sentence_splitting():
    from optispeech_tpu.text import TextProcessor

    tp = TextProcessor(tokenizer="char", add_blank=False, add_bos_eos=False,
                       normalize_text=True, languages=["en-us"])
    ids, _ = tp("First one. Second here! Third?", split_sentences=True)
    assert isinstance(ids[0], list) and len(ids) == 3
    flat, _ = tp("First one. Second here! Third?", split_sentences=False)
    assert isinstance(flat[0], int)
