"""Convert a reference (torch) checkpoint (BSRNN/DPCCN/TFGridNet/ConvTasNet
families) to a wesep-tpu bundle.

  python -m wesep_tpu.tools.convert_torch_checkpoint \
      --torch_ckpt avg_model.pt --config config.yaml --out avg_model.ckpt

Reads the reference's .pt bundle/state_dict, maps the separator core onto
the flax param tree (wesep_tpu.utils.torch_port), and writes a wesep-tpu
msgpack checkpoint loadable by bin/infer, the CLI extractor, and the
serving runtime. Jointly-trained wespeaker speaker branches — ECAPA,
ResNet, and CAMPPlus, all three families the reference's joint configs
name — are detected by state-dict fingerprint and ported too (with BN
running stats as batch_stats); ECAPA checkpoints run with
`spk_args: {layout: wespeaker}`.
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
        port_bsrnn_feats_state_dict,
        port_bsrnn_state_dict,
        port_convtasnet_state_dict,
        port_dpccn_state_dict,
        port_tfgridnet_state_dict,
        port_wespeaker_ecapa_state_dict,
    )

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    name = configs["model"]["tse_model"]
    margs = configs["model_args"]["tse_model"]
    sd = load_torch_state_dict(args.torch_ckpt)
    if name.startswith("BSRNN_Feats"):
        params = port_bsrnn_feats_state_dict(
            sd,
            sr=margs.get("sr", 16000),
            win=margs.get("win", 512),
            num_repeat=margs.get("num_repeat", 6),
            multi_fuse=margs.get("multi_fuse", False),
            use_spk_transform=margs.get("use_spk_transform", False),
            spk_fuse_type=margs.get("spk_fuse_type", "concat"),
        )
    elif name.startswith("BSRNN"):
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

    batch_stats = None
    spk_sd = {
        k.removeprefix("spk_model."): v
        for k, v in sd.items()
        if k.startswith("spk_model.")
    }
    if spk_sd:
        # flax scope of the joint branch: BSRNN family uses
        # 'spk_model_net' (bsrnn.py:250), DPCCN/TFGridNet 'spk_model'
        scope = "spk_model_net" if name.startswith("BSRNN") else "spk_model"
        # wespeaker ECAPA fingerprint: per-split BNs inside the Res2 stage
        if "layer2.se_res2block.1.bns.0.weight" in spk_sd:
            spk_params, spk_stats = port_wespeaker_ecapa_state_dict(spk_sd)
            params[scope] = spk_params
            batch_stats = {scope: spk_stats}
            print(
                "ported joint wespeaker-ECAPA speaker branch; run the "
                "model with spk_args: {layout: wespeaker}"
            )
        # wespeaker ResNet fingerprint: numbered block convs + seg_1 head
        elif ("layer1.0.conv1.weight" in spk_sd
              and "seg_1.weight" in spk_sd):
            from wesep_tpu.utils.torch_port import (
                port_wespeaker_resnet_state_dict,
            )

            spk_params, spk_stats = port_wespeaker_resnet_state_dict(spk_sd)
            params[scope] = spk_params
            batch_stats = {scope: spk_stats}
            print("ported joint wespeaker-ResNet speaker branch")
        # wespeaker CAMPPlus fingerprint: the D-TDNN xvector Sequential
        elif "xvector.tdnn.linear.weight" in spk_sd:
            from wesep_tpu.utils.torch_port import (
                port_wespeaker_campplus_state_dict,
            )

            spk_params, spk_stats = port_wespeaker_campplus_state_dict(
                spk_sd
            )
            params[scope] = spk_params
            batch_stats = {scope: spk_stats}
            print("ported joint wespeaker-CAMPPlus speaker branch")
        else:
            print(
                "NOTE: joint speaker-encoder weights present in the source "
                "but not a wespeaker ECAPA/ResNet/CAMPPlus layout; use "
                "spk_feat inference with a separately trained encoder or "
                "retrain the joint branch."
            )
    save_checkpoint(
        args.out, [params],
        batch_stats=[batch_stats] if batch_stats else None,
    )
    n = sum(
        v.size for v in _leaves(params)
    )
    print(f"wrote {args.out} ({n / 1e6:.2f} M params)")


def _leaves(tree):
    import numpy as np

    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield np.asarray(v)


if __name__ == "__main__":
    main()
