"""Compute ops: recurrent cells, distributions, folding, decode kernels.

These supply the TPU-native equivalents of the kernels the reference gets
implicitly from cuDNN (SURVEY.md §2d, C22-C24).
"""
