"""Scoring entry point: BSS-eval + STOI/ESTOI/SI-SNR (+optional PESQ).

Equivalent of /root/reference/wesep/bin/score.py:32-337 without the
mir_eval/pystoi/pesq dependencies: bss_eval_sources with permutation, STOI
and ESTOI (native, wesep_tpu.utils.{bss_eval,stoi}), SI-SNR and SDR per
speaker, written as kaldi-datadir text files {METRIC}_spk{i} keyed by utt,
plus a RESULTS summary with per-metric averages (the tools/score.sh
merge+awk stage folded in).

Usage:
  python -m wesep_tpu.bin.score --output_dir out --key_file keys.scp \
      --ref_scp ref1.scp ref2.scp --inf_scp inf1.scp inf2.scp [--use_pesq]
"""

import argparse
import logging
import os
from collections import defaultdict

import numpy as np


def get_args():
    parser = argparse.ArgumentParser(description="wesep-tpu score")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--key_file", required=True)
    parser.add_argument("--ref_scp", nargs="+", required=True)
    parser.add_argument("--inf_scp", nargs="+", required=True)
    parser.add_argument("--use_pesq", action="store_true")
    parser.add_argument("--use_dnsmos", action="store_true")
    parser.add_argument("--log_level", default="INFO")
    return parser.parse_args()


def scoring(
    output_dir: str,
    key_file: str,
    ref_scp,
    inf_scp,
    use_pesq: bool = False,
    use_dnsmos: bool = False,
):
    from wesep_tpu.data.wav_io import read_wav
    from wesep_tpu.utils.bss_eval import bss_eval_sources
    from wesep_tpu.utils.file_utils import read_2columns_text
    from wesep_tpu.utils.score import cal_PESQ, cal_SISNR
    from wesep_tpu.utils.stoi import stoi

    assert len(ref_scp) == len(inf_scp)
    num_spk = len(ref_scp)
    keys = [
        line.rstrip().split(maxsplit=1)[0]
        for line in open(key_file, encoding="utf-8")
    ]
    ref_maps = [read_2columns_text(p) for p in ref_scp]
    inf_maps = [read_2columns_text(p) for p in inf_scp]

    os.makedirs(output_dir, exist_ok=True)
    metrics = ["STOI", "ESTOI", "SI_SNR", "SDR", "SAR", "SIR"]
    if use_pesq:
        metrics.append("PESQ")
    files = {
        (m, i): open(
            os.path.join(output_dir, f"{m}_spk{i + 1}"), "w",
            encoding="utf-8",
        )
        for m in metrics
        for i in range(num_spk)
    }
    sums = defaultdict(float)
    counts = defaultdict(int)

    sample_rate = None
    for n, key in enumerate(keys):
        logging.info("[%d] Scoring %s", n, key)
        refs, infs = [], []
        for i in range(num_spk):
            r, sr = read_wav(ref_maps[i][key])
            e, sr2 = read_wav(inf_maps[i][key])
            assert sr == sr2, (sr, sr2)
            sample_rate = sr
            t = min(r.shape[-1], e.shape[-1])
            refs.append(r[0, :t])
            infs.append(e[0, :t])
        t = min(min(r.shape[-1] for r in refs),
                min(e.shape[-1] for e in infs))
        ref = np.stack([r[:t] for r in refs])
        inf = np.stack([e[:t] for e in infs])

        sdr, sir, sar, perm = bss_eval_sources(ref, inf)
        for i in range(num_spk):
            p = int(perm[i])
            row = {
                "SDR": sdr[i],
                "SIR": sir[i],
                "SAR": sar[i],
                "SI_SNR": cal_SISNR(inf[i], ref[p]),
                "STOI": stoi(ref[p], inf[i], sample_rate),
                "ESTOI": stoi(ref[p], inf[i], sample_rate, extended=True),
            }
            if use_pesq:
                pq = cal_PESQ(inf[i], ref[p], sample_rate)
                row["PESQ"] = pq if pq is not None else float("nan")
            for m, v in row.items():
                files[(m, i)].write(f"{key} {v:.4f}\n")
                if np.isfinite(v):
                    sums[m] += v
                    counts[m] += 1
    for f in files.values():
        f.close()

    with open(os.path.join(output_dir, "RESULTS"), "w") as f:
        for m in metrics:
            avg = sums[m] / max(counts[m], 1)
            f.write(f"{m}: {avg:.4f}\n")
            logging.info("%s: %.4f", m, avg)
    return {m: sums[m] / max(counts[m], 1) for m in metrics}


def main():
    args = get_args()
    logging.basicConfig(level=args.log_level)
    scoring(
        args.output_dir,
        args.key_file,
        args.ref_scp,
        args.inf_scp,
        use_pesq=args.use_pesq,
        use_dnsmos=args.use_dnsmos,
    )


if __name__ == "__main__":
    main()
