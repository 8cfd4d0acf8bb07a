"""Torch-checkpoint -> flax-param conversion for the model zoo.

Maps reference (wenet-e2e/wesep) torch state_dicts onto wesep-tpu param
trees so models trained with the reference toolkit (including the
published hub checkpoints) run on the TPU stack. The mappings mirror the
weight-port parity tests (tests/test_bsrnn.py etc.), operating on plain
state-dict key/value pairs (values: numpy arrays).

Currently covered: BSRNN / BSRNN_Multi separator cores (band norms,
bottlenecks, fuse layers, BSNets, mask MLPs, speaker transform). The
joint speaker-encoder branch depends on wespeaker's internal layout and
is ported best-effort when `spk_map` hooks are provided.
"""

from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["port_bsrnn_state_dict", "load_torch_state_dict"]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt checkpoint into {key: numpy} (handles the
    reference's {'models': [state_dict, ...]} bundles and raw
    state_dicts)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "models" in obj:
        obj = obj["models"][0]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")  # DDP wrapper
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def _lstm(sd, prefix):
    out = {}
    for suffix, tag in (("", "f"), ("_reverse", "b")):
        out[f"wx_{tag}"] = sd[f"{prefix}.weight_ih_l0{suffix}"].T
        out[f"wh_{tag}"] = sd[f"{prefix}.weight_hh_l0{suffix}"].T
        out[f"b_{tag}"] = (
            sd[f"{prefix}.bias_ih_l0{suffix}"]
            + sd[f"{prefix}.bias_hh_l0{suffix}"]
        )
    return out


def _resrnn(sd, prefix):
    return {
        "norm_scale": sd[f"{prefix}.norm.weight"],
        "norm_bias": sd[f"{prefix}.norm.bias"],
        "rnn": _lstm(sd, f"{prefix}.rnn"),
        "proj": {
            "kernel": sd[f"{prefix}.proj.weight"].T,
            "bias": sd[f"{prefix}.proj.bias"],
        },
    }


def _conv1x1(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"][:, :, 0].T,
        "bias": sd[f"{prefix}.bias"],
    }


def _grouped(stacks):
    return {k: np.stack([s[k] for s in stacks]) for k in stacks[0]}


def port_bsrnn_state_dict(
    sd: Dict[str, np.ndarray],
    sr: int = 16000,
    win: int = 512,
    num_repeat: int = 6,
    multi_fuse: bool = False,
    use_spk_transform: bool = False,
    spk_fuse_type: str = "multiply",
    spk_map: Optional[Callable[[Dict[str, np.ndarray]], dict]] = None,
) -> dict:
    """Reference BSRNN state_dict -> wesep_tpu BSRNN params.

    spk_map: optional fn mapping the `spk_model.*` sub-dict onto the
    `spk_model_net` flax subtree (wespeaker-layout dependent).
    """
    from wesep_tpu.models.bsrnn import band_layout

    groups = band_layout(sr, win // 2 + 1)
    params: dict = {}

    band = 0
    for gi, (n, bw) in enumerate(groups):
        norms, projs = [], []
        for i in range(band, band + n):
            norms.append({
                "scale": sd[f"BN.{i}.0.weight"],
                "bias": sd[f"BN.{i}.0.bias"],
            })
            projs.append(_conv1x1(sd, f"BN.{i}.1"))
        params[f"bn_norm_{gi}"] = _grouped(norms)
        params[f"bn_proj_{gi}"] = _grouped(projs)
        band += n

    if use_spk_transform:
        convs = sorted(
            {
                int(k.split(".")[2])
                for k in sd
                if k.startswith("spk_transform.transforms.")
            }
        )
        params["spk_transform"] = {
            f"Dense_{j}": _conv1x1(sd, f"spk_transform.transforms.{idx}")
            for j, idx in enumerate(convs)
        }

    # separator: multi_fuse -> [fuse, bsnet] * R; else fuse + bsnet * R
    if multi_fuse:
        fuse_idx = list(range(0, 2 * num_repeat, 2))
        bsnet_idx = list(range(1, 2 * num_repeat, 2))
    else:
        fuse_idx = [0]
        bsnet_idx = list(range(1, num_repeat + 1))
    if spk_fuse_type != "None":
        for j, idx in enumerate(fuse_idx):
            base = f"separator.separation.{idx}.fc"
            if spk_fuse_type == "FiLM":
                raise NotImplementedError("FiLM fuse port not implemented")
            params[f"fuse_{j}"] = {
                "Dense_0": {
                    "kernel": sd[f"{base}.linear.weight"].T,
                    "bias": sd[f"{base}.linear.bias"],
                }
            }
    for j, idx in enumerate(bsnet_idx):
        base = f"separator.separation.{idx}"
        params[f"bsnet_{j}"] = {
            "band_rnn": _resrnn(sd, f"{base}.band_rnn"),
            "band_comm": _resrnn(sd, f"{base}.band_comm"),
        }

    band = 0
    for gi, (n, bw) in enumerate(groups):
        norms, fc1, fc2, out = [], [], [], []
        for i in range(band, band + n):
            norms.append({
                "scale": sd[f"mask.{i}.0.weight"],
                "bias": sd[f"mask.{i}.0.bias"],
            })
            fc1.append(_conv1x1(sd, f"mask.{i}.1"))
            fc2.append(_conv1x1(sd, f"mask.{i}.3"))
            out.append(_conv1x1(sd, f"mask.{i}.5"))
        params[f"mask_norm_{gi}"] = _grouped(norms)
        params[f"mask_fc1_{gi}"] = _grouped(fc1)
        params[f"mask_fc2_{gi}"] = _grouped(fc2)
        params[f"mask_out_{gi}"] = _grouped(out)
        band += n

    if spk_map is not None:
        spk_sd = {
            k.removeprefix("spk_model."): v
            for k, v in sd.items()
            if k.startswith("spk_model.")
        }
        if spk_sd:
            params["spk_model_net"] = spk_map(spk_sd)
    if "pred_linear.weight" in sd:
        params["pred_linear"] = {
            "kernel": sd["pred_linear.weight"].T,
            "bias": sd["pred_linear.bias"],
        }
    return params
