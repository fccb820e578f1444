"""Default hyperparameters for wavernn_tpu.

This file is a *config*, loadable at runtime via ``hp.configure(path)`` or the
``--hp_file`` flag on every CLI.  Parameter names keep the reference's public
config surface (ref: hparams.py:1-97) so existing users can move their configs
over unchanged; values are the published LJSpeech operating point.
"""

# CONFIG ---------------------------------------------------------------------

wav_path = "/path/to/wav_files/"        # input dataset (override with --path)
data_path = "data/"                      # preprocessed feature output

# Model ids are separate so a new TTS can pair with an old vocoder and back.
voc_model_id = "ljspeech_mol"
tts_model_id = "ljspeech_lsa_smooth_attention"

ignore_tts = False                       # True if only the vocoder is wanted

# DSP ------------------------------------------------------------------------

sample_rate = 22050
n_fft = 2048
fft_bins = n_fft // 2 + 1
num_mels = 80
hop_length = 275                         # 12.5 ms (Tacotron-2 operating point)
win_length = 1100                        # 50 ms
fmin = 40
min_level_db = -100
ref_level_db = 20
bits = 9                                 # bit depth of the RAW-mode signal
mu_law = True                            # companding for RAW mode
peak_norm = False                        # normalize each wav to its peak

# WAVERNN / VOCODER ------------------------------------------------------------

voc_mode = "MOL"                         # 'RAW' (softmax over 2**bits) | 'MOL'
voc_upsample_factors = (5, 5, 11)        # must factorize hop_length
voc_rnn_dims = 512
voc_fc_dims = 512
voc_compute_dims = 128
voc_res_out_dims = 128
voc_res_blocks = 10

# Training
voc_batch_size = 32
voc_lr = 1e-4
voc_checkpoint_every = 25_000
voc_gen_at_checkpoint = 5                # samples generated at each checkpoint
voc_total_steps = 1_000_000
voc_test_samples = 50                    # unseen held-out audition utterances
voc_pad = 2                              # conditioning context for the resnet
voc_seq_len = hop_length * 5             # must be a multiple of hop_length
voc_clip_grad_norm = 4                   # None disables clipping
voc_seq_chunks = 1                       # >1: sequence-chunked BPTT — k-times
                                         # shorter scans (the TPU step is
                                         # scan-bound), gradients truncated at
                                         # chunk boundaries; 1 = exact BPTT
voc_chunk_warmup = 128                   # teacher-forced context samples that
                                         # re-warm the hidden state per chunk

# Sparse training (WaveRNN-paper magnitude pruning, cubic ramp; the
# reference prototyped this in notebooks/Pruning - Scratchpad.ipynb —
# here it is wired into voc_train_loop, masks fused into the train step)
voc_prune = False                        # engage pruning during training
voc_prune_target_sparsity = 0.9375       # Z: final zeroed fraction
voc_prune_start = 20_000                 # t0: ramp start step
voc_prune_ramp = 480_000                 # S: ramp length in steps
voc_prune_every = 500                    # mask recompute cadence

# Generating / Synthesizing
voc_gen_batched = True                   # fold-parallel batched generation
voc_target = 11_000                      # samples generated per batch entry
voc_overlap = 550                        # crossfade overlap between folds

# TACOTRON / TTS ---------------------------------------------------------------

tts_embed_dims = 256
tts_encoder_dims = 128
tts_decoder_dims = 256
tts_postnet_dims = 128
tts_encoder_K = 16
tts_lstm_dims = 512
tts_postnet_K = 8
tts_num_highways = 4
tts_dropout = 0.5
tts_cleaner_names = ["english_cleaners"]
tts_stop_threshold = -3.4                # end generation when a frame is all < this

# Progressive training schedule: (r, lr, max_step, batch_size)
tts_schedule = [
    (7, 1e-3, 10_000, 32),
    (5, 1e-4, 100_000, 32),
    (2, 1e-4, 180_000, 16),
    (2, 1e-4, 350_000, 8),
]

tts_max_mel_len = 1250                   # drop outlier-length spectrograms
tts_bin_lengths = True                   # length-binned batching
tts_pad_text_multiple = 1                # pad batch text length up to a multiple
                                         # (>1 buckets shapes for XLA program reuse)
tts_pad_mel_multiple = 1                 # pad batch mel length up to a multiple
tts_clip_grad_norm = 1.0                 # None disables clipping
tts_checkpoint_every = 2_000

# TPU ---------------------------------------------------------------------------

mesh_shape = None                        # e.g. {"data": 4, "model": 2}; None = all-data
gen_use_pallas = True                    # fused Pallas decode kernel when on TPU
gen_int8 = False                         # int8 GRU/FC weight streaming in the kernel.
                                         # OFF since round 3: pipelined A/Bs show int8
                                         # SLOWER than bf16 at every production fold
                                         # width (docs/ROADMAP.md); pass --int8 or set
                                         # True to re-enable the quantized path
