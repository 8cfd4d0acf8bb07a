"""wesep_tpu: TPU-native target speaker extraction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wenet-e2e/wesep (reference mounted at /root/reference): target-speaker
extraction (TSE) training + inference on TPU pod slices.

Layers (mirrors reference SURVEY.md layer map, rebuilt TPU-first):
  ops/       signal kernels: STFT/iSTFT framed matmuls, kaldi fbank, LSTM scan
  models/    flax separation backbones (Spex+, BSRNN, DPCCN, TF-GridNet)
             + native speaker encoders (ResNet34, ECAPA-TDNN)
  data/      host-side shard IO + jittable on-device augmentation pipeline
  train/     pure-fn train step, losses, schedulers, checkpointing
  parallel/  mesh construction and sharding rules (pjit/shard_map)
  bin/       config-driven entry points (train/infer/score/average/export)
"""

__version__ = "0.1.0"
