"""Convert a reference (torch) checkpoint (BSRNN/DPCCN/TFGridNet/ConvTasNet
families) to a wesep-tpu bundle.

  python -m wesep_tpu.tools.convert_torch_checkpoint \
      --torch_ckpt avg_model.pt --config config.yaml --out avg_model.ckpt

Reads the reference's .pt bundle/state_dict, maps the separator core onto
the flax param tree (wesep_tpu.utils.torch_port), and writes a wesep-tpu
msgpack checkpoint loadable by bin/infer, the CLI extractor, and the
serving runtime. Joint speaker-encoder weights are skipped unless a
wespeaker mapping is added (PARITY.md known gaps).
"""

import argparse


def get_args():
    parser = argparse.ArgumentParser(description="torch -> wesep-tpu ckpt")
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--config", required=True,
                        help="reference config.yaml with model_args")
    parser.add_argument("--out", required=True)
    return parser.parse_args()


def main():
    args = get_args()
    import yaml

    from wesep_tpu.train.checkpoint import save_checkpoint
    from wesep_tpu.utils.torch_port import (
        load_torch_state_dict,
        port_bsrnn_state_dict,
        port_convtasnet_state_dict,
        port_dpccn_state_dict,
        port_tfgridnet_state_dict,
    )

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    name = configs["model"]["tse_model"]
    margs = configs["model_args"]["tse_model"]
    sd = load_torch_state_dict(args.torch_ckpt)
    if name.startswith("BSRNN"):
        params = port_bsrnn_state_dict(
            sd,
            sr=margs.get("sr", 16000),
            win=margs.get("win", 512),
            num_repeat=margs.get("num_repeat", 6),
            multi_fuse=margs.get("multi_fuse", True),
            use_spk_transform=margs.get("use_spk_transform", True),
            spk_fuse_type=margs.get("spk_fuse_type", "concat"),
        )
    elif name.startswith("DPCCN"):
        params = port_dpccn_state_dict(sd)
    elif name.startswith("TFGridNet"):
        params = port_tfgridnet_state_dict(sd)
    elif name.startswith("ConvTasNet"):
        params = port_convtasnet_state_dict(
            sd, num_repeat=margs.get("R", 4)
        )
    else:
        raise SystemExit(f"no converter for model family {name}")
    save_checkpoint(args.out, [params])
    n = sum(
        v.size for v in _leaves(params)
    )
    print(f"wrote {args.out} ({n / 1e6:.2f} M params)")
    if any(k.startswith("spk_model.") for k in sd):
        print(
            "NOTE: joint speaker-encoder weights present in the source but "
            "not ported (wespeaker layout); use spk_feat inference with a "
            "separately trained encoder or retrain the joint branch."
        )


def _leaves(tree):
    import numpy as np

    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield np.asarray(v)


if __name__ == "__main__":
    main()
