"""Data layer: preprocessing, datasets, loaders, samplers
(ref: preprocess.py, utils/dataset.py)."""
