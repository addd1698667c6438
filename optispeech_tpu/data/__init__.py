"""Data pipeline (L5): datafile reading, bucketed collation, preprocessing."""

from .datamodule import TextWavDataset, BucketedCollate, DataLoader, SyntheticDataset

__all__ = ["TextWavDataset", "BucketedCollate", "DataLoader", "SyntheticDataset"]
