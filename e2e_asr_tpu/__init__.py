"""e2e_asr_tpu — a TPU-native end-to-end ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the hybrid CTC/attention LAS
recipe implemented by the reference (`Chung-I/End-to-end-ASR-Pytorch`,
a fork of `Alexander-H-Liu/End-to-end-ASR-Pytorch`):

- on-device log-mel / MFCC feature frontend (fused Pallas kernel + XLA oracle)
  [ref: src/audio.py]
- VGG / CNN prenet + pyramidal BiLSTM listener expressed as `jax.lax.scan`
  [ref: src/module.py]
- dot-product / location-aware attention speller with scheduled teacher
  forcing [ref: src/asr.py, src/module.py]
- joint CTC/attention objective with the CTC forward-backward recursion as a
  Pallas kernel over the label lattice [ref: bin/train_asr.py, torch CTCLoss]
- fully batched, jit-compiled beam search with CTC prefix scoring and RNN-LM
  shallow fusion [ref: src/decode.py, src/ctc.py]
- data-parallel SPMD training over a `jax.sharding.Mesh` (ICI/DCN
  collectives inserted by XLA) — the reference is single-GPU.

Nothing here is a translation of the reference's torch code; the reference
defines the capability surface (see SURVEY.md), the implementation is
TPU-first.
"""

__version__ = "0.1.0"
