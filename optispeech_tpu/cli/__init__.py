"""Command-line entry points (L6): train, infer, preprocess, stats, export."""
