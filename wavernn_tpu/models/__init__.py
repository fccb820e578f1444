"""Model architectures: WaveRNN vocoder, Tacotron TTS, DeepMind variant."""
