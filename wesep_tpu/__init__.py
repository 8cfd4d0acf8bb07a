"""wesep_tpu: TPU-native target speaker extraction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wenet-e2e/wesep (reference mounted at /root/reference): target-speaker
extraction (TSE) training + inference on TPU pod slices.

Layers (mirrors reference SURVEY.md layer map, rebuilt TPU-first):
  ops/       signal kernels: STFT/iSTFT framed matmuls, kaldi fbank, LSTM scan
  models/    flax separation backbones (Spex+, BSRNN, DPCCN, TF-GridNet)
             + native speaker encoders (ResNet34, ECAPA-TDNN)
  data/      host-side shard IO + jittable on-device augmentation pipeline
  train/     pure-fn train steps (data-parallel mesh, GAN, SSA), losses,
             schedulers, checkpointing
  bin/       config-driven entry points (train/infer/score/average/export)
  cli/       end-user extraction CLI + pretrained hub
  tools/     shard/noise-db builders, embedding extraction, validation
"""

__version__ = "0.1.0"



def load_model(language: str):
    """Lazy import of the CLI extractor (reference wesep/__init__.py)."""
    from wesep_tpu.cli.extractor import load_model as _lm

    return _lm(language)


def load_model_local(model_dir: str):
    from wesep_tpu.cli.extractor import load_model_local as _lml

    return _lml(model_dir)
