"""Inference entry point: whole-utterance TSE + SI-SNR(i) reporting.

Equivalent of /root/reference/wesep/bin/infer.py:27-198: batch-1
whole-utterance decoding, 0.9 peak normalization, `Utt{n}-{key}-T{spk}.wav`
outputs, per-utt and average SI-SNR / SI-SNRi + acceptance rate
(SI-SNRi > 1 dB), and the filename-convention scp for stage-6 scoring.

TPU notes:
- variable utterance lengths are padded up to a bucket multiple
  (`length_bucket`, default 16000) so XLA compiles one graph per bucket
  instead of one per length; iSTFT `length=` semantics make the unpad
  exact;
- decode rows are independent, so they batch per bucket and shard over
  all local chips on a 1-D `jax.sharding.Mesh` (`infer_batch_size` total
  rows per step, default one utterance per chip) — the reference decodes
  strictly one utterance at a time on one device.
"""

import argparse
import os
import time

import numpy as np


def get_args():
    parser = argparse.ArgumentParser(description="wesep-tpu infer")
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE",
    )
    return parser.parse_args()


def generate_enhanced_scp(audio_dir: str, n_spk: int = 2):
    """Write spk{i}.scp mapping from the Utt*-T{spk}.wav naming convention
    (reference utils.py:115-136)."""
    for i in range(1, n_spk + 1):
        entries = []
        for name in sorted(os.listdir(audio_dir)):
            if name.endswith(".wav"):
                parts = name[:-4].split("-")
                if len(parts) >= 3 and parts[-1] == f"T{i - 1}":
                    key = "-".join(parts[1:-1])
                    entries.append((key, os.path.join(audio_dir, name)))
        with open(os.path.join(audio_dir, f"spk{i}.scp"), "w") as f:
            for key, path in entries:
                f.write(f"{key} {path}\n")


def infer(config: str, overrides=None, **kwargs):
    import jax

    from wesep_tpu.data import BatchLoader, Dataset, tse_collate_fn_2spk
    from wesep_tpu.data.wav_io import write_wav
    from wesep_tpu.models import get_model
    from wesep_tpu.train.checkpoint import load_checkpoint
    from wesep_tpu.utils import setup_compilation_cache
    from wesep_tpu.utils.config import (
        deep_update,
        parse_config_or_kwargs,
        parse_override_args,
        set_seed,
        setup_logger,
    )
    from wesep_tpu.utils.file_utils import (
        read_label_file,
        read_vec_scp_file,
    )
    from wesep_tpu.utils.score import cal_SISNRi

    setup_compilation_cache()
    start = time.time()
    configs = parse_config_or_kwargs(config, **kwargs)
    deep_update(configs, parse_override_args(overrides))
    save_wav = configs.get("save_wav", True)
    set_seed(configs.get("seed", 42))
    sample_rate = 16000 if configs.get("fs", "16k") in (None, "16k", 16000) \
        else 8000

    model_args = dict(configs["model_args"]["tse_model"])
    model_args.pop("spk_model_init", None)
    model = get_model(configs["model"]["tse_model"])(**model_args)
    model_path = configs["checkpoint"]

    logger = setup_logger(configs["exp_dir"], name="infer.log")
    logger.info("Load checkpoint from %s", model_path)
    audio_dir = os.path.join(configs["exp_dir"], "audio")
    os.makedirs(audio_dir, exist_ok=True)

    bundle = load_checkpoint(model_path)
    params = bundle["models"][0]
    batch_stats = (
        bundle["batch_stats"][0] if bundle.get("batch_stats") else {}
    )
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    joint_training = model_args.get("joint_training", False)
    test_spk_embeds = configs.get("test_spk_embeds", None)
    if not joint_training and test_spk_embeds:
        test_spk2embed_dict = read_vec_scp_file(test_spk_embeds)
    else:
        test_spk2embed_dict = read_label_file(configs["test_spk2utt"])
    test_spk1_embed = read_label_file(configs["test_spk1_enroll"])
    test_spk2_embed = read_label_file(configs["test_spk2_enroll"])

    test_dataset = Dataset(
        configs["data_type"],
        configs["test_data"],
        configs["dataset_args"],
        test_spk2embed_dict,
        test_spk1_embed,
        test_spk2_embed,
        state="test",
        joint_training=joint_training,
        whole_utt=configs.get("whole_utt", True),
        repeat_dataset=False,
    )
    # static enrollment length (same default as bin/train): without it,
    # every distinct enrollment length would trigger an XLA recompile
    dataset_args = configs["dataset_args"]
    enroll_len = dataset_args.get("enroll_len", None)
    if enroll_len is None and joint_training:
        if dataset_args.get("speaker_feat", False):
            shift = dataset_args.get("fbank_args", {}).get("frame_shift", 10)
            enroll_len = int(
                dataset_args.get("enroll_sec", 6) * 1000 / shift
            ) - 2
        else:
            enroll_len = int(
                dataset_args.get("enroll_sec", 6) * sample_rate
            )
    loader = BatchLoader(
        test_dataset, batch_size=1,
        collate_fn=lambda b: tse_collate_fn_2spk(
            b, fixed_enroll_len=enroll_len
        ),
        drop_last=False, prefetch=2,
    )
    logger.info("test number: %d", len(test_spk2embed_dict) // 2)

    bucket = int(configs.get("length_bucket", 16000))

    # Multi-chip decode: rows (mixture x target pairs) are independent, so
    # the batch axis shards over a 1-D device mesh — XLA splits each step
    # across all local chips with no collectives in the forward. Rows are
    # buffered per length bucket so every step has one static shape
    # (rows_per_step x pad_len); remainders are zero-padded rows whose
    # outputs are dropped. `infer_batch_size` = total rows per step
    # (default 2 x n_devices, i.e. one utterance per chip; on a single
    # chip this matches the reference's per-utterance decode,
    # /root/reference/wesep/bin/infer.py:101-141).
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    n_dev = jax.local_device_count()
    rows_per_step = int(configs.get("infer_batch_size", 2 * n_dev))
    rows_per_step = max(n_dev,
                        (rows_per_step + n_dev - 1) // n_dev * n_dev)
    # local devices only: each process decodes its own utterances from
    # host-local buffers (a global mesh would need globally-addressable
    # inputs, which whole-utterance decode does not have)
    mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
    row_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())

    def _fwd(v, m, e):
        est = model.apply(v, m, e, train=False)[0]
        # multi-scale decoders (SpEx+) return [est1, est2, est3]; decode
        # uses the short-window estimate like the reference
        # (/root/reference/wesep/bin/infer.py:121-122 takes outputs[0])
        if isinstance(est, (list, tuple)):
            est = est[0]
        return est

    forward = jax.jit(
        _fwd,
        in_shardings=(rep_sh, row_sh, row_sh),
        out_shardings=row_sh,
    )

    total_sisnr = total_sisnri = 0.0
    total_cnt = accept_cnt = 0
    audio_total = 0.0

    def _flush(pad_len, rows):
        nonlocal total_sisnr, total_sisnri, total_cnt, accept_cnt
        mix_b = np.zeros((rows_per_step, pad_len), np.float32)
        enr_b = np.zeros(
            (rows_per_step,) + rows[0]["enroll"].shape, np.float32
        )
        for r_i, r in enumerate(rows):
            mix_b[r_i, : r["t_len"]] = r["mix"]
            enr_b[r_i] = r["enroll"]
        ests = np.asarray(forward(variables, mix_b, enr_b))
        for r, est in zip(rows, ests):
            est = est[: r["t_len"]]
            est = est / np.max(np.abs(est)) * 0.9  # peak norm (infer.py:124)
            if save_wav:
                write_wav(
                    os.path.join(
                        audio_dir, f"Utt{r['utt']}-{r['key']}-T{r['row']}.wav"
                    ),
                    est,
                    sample_rate,
                )
            sisnr, sisnri = cal_SISNRi(est, r["target"], r["mix"])
            logger.info(
                "Utt=%d Key=%s Target=%s SI-SNR=%.3f SI-SNRi=%.3f",
                r["utt"], r["key"], r["spk"], sisnr, sisnri,
            )
            total_sisnr += sisnr
            total_sisnri += sisnri
            total_cnt += 1
            if sisnri > 1.0:
                accept_cnt += 1

    groups = {}  # pad_len -> buffered rows
    for i, batch in enumerate(loader):
        mix = batch["wav_mix"]
        targets = batch["wav_targets"]
        enroll = batch["spk_embeds"]
        t_len = mix.shape[-1]
        pad_len = ((t_len + bucket - 1) // bucket) * bucket
        audio_total += t_len / sample_rate * mix.shape[0]
        for j in range(mix.shape[0]):
            groups.setdefault(pad_len, []).append({
                "mix": mix[j], "target": targets[j], "enroll": enroll[j],
                "t_len": t_len, "utt": i + 1, "row": j,
                "key": batch["key"][j], "spk": batch["spk"][j],
            })
            if len(groups[pad_len]) == rows_per_step:
                _flush(pad_len, groups.pop(pad_len))
    for pad_len in sorted(groups):
        _flush(pad_len, groups[pad_len])
    elapsed = time.time() - start
    if total_cnt:
        logger.info("Average SI-SNR: %.3f", total_sisnr / total_cnt)
        logger.info("Average SI-SNRi: %.3f", total_sisnri / total_cnt)
        logger.info(
            "Acceptance rate (SI-SNRi > 1dB): %.3f",
            accept_cnt / total_cnt,
        )
    logger.info(
        "Processed %.1fs audio in %.1fs (RTF %.4f)",
        audio_total, elapsed,
        elapsed / max(audio_total, 1e-9),
    )
    if save_wav:
        generate_enhanced_scp(audio_dir)
    return (
        total_sisnr / max(total_cnt, 1),
        total_sisnri / max(total_cnt, 1),
    )


def main():
    args = get_args()
    infer(args.config, overrides=args.overrides)


if __name__ == "__main__":
    main()
