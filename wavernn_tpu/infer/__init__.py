"""Inference/serving runtime: audition generation, file synthesis, TTS e2e."""
