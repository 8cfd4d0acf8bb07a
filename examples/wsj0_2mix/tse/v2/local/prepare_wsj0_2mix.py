"""WSJ0-2Mix data preparation.

The reference lists WSJ0-2Mix as an open roadmap item
(/root/reference/README.md:46 "[ ] WSJ0-2Mix"); this recipe closes it
with the same staged layout as the Libri2Mix v2 recipe. Scans a
wsj0-2mix tree (`.../wav16k/min` with tr/cv/tt splits, mix|s1|s2 dirs)
and writes, per split,
  wav.scp spk1.scp spk2.scp       (mixture + clean sources)
  utt2spks                        (utt -> "spkA spkB")
  single.utt2spk                  (source utts for embedding training)
  spk2enroll.json                 (spk -> [(utt, wav_path)])
  spk1_enroll / spk2_enroll       (fixed cv/tt enrollment maps)
  enroll_wav.scp                  (enroll utt-id -> wav path)

Mixture keys follow the wsj0-2mix convention
`<utt1>_<snr1>_<utt2>_<snr2>`; wsj0 speaker ids are the first three
characters of a source utterance id (e.g. '011a0101' -> '011').
Official fixed enrollment maps: the BUT speakerbeam egs/wsj0_2mix
`map_mixture2enrollment` files are supported via --mix2enroll so
SI-SNRi numbers are comparable with published TSE results.
"""

import argparse
import json
import os
import random
from collections import defaultdict


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wsj0_2mix_dir", required=True,
                        help=".../wsj0-mix/2speakers/wav16k/min")
    parser.add_argument("--out_dir", default="data")
    parser.add_argument("--seed", type=int, default=17)
    parser.add_argument(
        "--splits", nargs="*",
        default=["tr:train", "cv:dev", "tt:test"],
        help="wsj0mix_split:out_split pairs",
    )
    parser.add_argument(
        "--mix2enroll", nargs="*", default=[],
        help="out_split:path pairs pointing to the BUT-speakerbeam"
        " egs/wsj0_2mix map_mixture2enrollment files; when given, the"
        " fixed enrollment maps for that split are taken from the"
        " official file, otherwise a deterministic per-seed map is"
        " generated.",
    )
    return parser.parse_args()


def spk_of(utt_id: str) -> str:
    return utt_id[:3]


def split_key(key: str):
    """`<utt1>_<snr1>_<utt2>_<snr2>` -> (utt1, utt2)."""
    parts = key.split("_")
    if len(parts) != 4:
        raise ValueError(f"unexpected wsj0-2mix key layout: {key}")
    return parts[0], parts[2]


def read_mix2enroll(path: str):
    """Parse a speakerbeam map_mixture2enrollment file for wsj0-2mix.

    Lines are `mix_id utt_id enroll_id`; the target slot follows from
    utt_id's position in the 4-field mix key (fields 0/2 -> s1/s2).
    enroll_id is either ANOTHER MIXTURE's 4-field key (the speakerbeam
    convention — enrollment audio is the target speaker's rendition in
    that mixture's s1/s2 stream) or a bare wsj0 utterance id."""
    out = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            mix_id, utt_id, enroll_id = line.split()
            sid = mix_id.split("_").index(utt_id) // 2 + 1
            out[(mix_id, sid)] = enroll_id
    return out


def prepare_split(mix_dir: str, out_dir: str, rng: random.Random,
                  fixed_enroll: bool, mix2enroll_file: str = None):
    mix_sub = os.path.join(mix_dir, "mix")
    s1_dir = os.path.join(mix_dir, "s1")
    s2_dir = os.path.join(mix_dir, "s2")
    os.makedirs(out_dir, exist_ok=True)

    utts = sorted(f[:-4] for f in os.listdir(mix_sub) if f.endswith(".wav"))
    spk2utts = defaultdict(list)
    with open(os.path.join(out_dir, "wav.scp"), "w") as f_mix, open(
        os.path.join(out_dir, "spk1.scp"), "w"
    ) as f_s1, open(os.path.join(out_dir, "spk2.scp"), "w") as f_s2, open(
        os.path.join(out_dir, "utt2spks"), "w"
    ) as f_spks, open(
        os.path.join(out_dir, "single.utt2spk"), "w"
    ) as f_single:
        for utt in utts:
            u1, u2 = split_key(utt)
            f_mix.write(f"{utt} {mix_sub}/{utt}.wav\n")
            f_s1.write(f"{utt} {s1_dir}/{utt}.wav\n")
            f_s2.write(f"{utt} {s2_dir}/{utt}.wav\n")
            f_spks.write(f"{utt} {spk_of(u1)} {spk_of(u2)}\n")
            for u, d in ((u1, s1_dir), (u2, s2_dir)):
                f_single.write(f"{u} {spk_of(u)}\n")
                spk2utts[spk_of(u)].append(
                    (u, os.path.join(d, f"{utt}.wav"))
                )

    with open(os.path.join(out_dir, "spk2enroll.json"), "w") as f:
        json.dump(spk2utts, f, indent=1)

    if fixed_enroll:
        maps = {1: {}, 2: {}}
        extra_enroll = {}
        if mix2enroll_file:
            official = read_mix2enroll(mix2enroll_file)
            for utt in utts:
                u1, u2 = split_key(utt)
                for idx, target in ((1, u1), (2, u2)):
                    eu = official.get((utt, idx))
                    if eu is None:
                        raise KeyError(
                            f"{utt} s{idx} missing from {mix2enroll_file}"
                        )
                    if len(eu.split("_")) == 4:
                        # speakerbeam convention: the third column is
                        # ANOTHER MIXTURE's key; the enrollment audio is
                        # the target speaker's rendition inside it
                        # (s1 or s2 stream, chosen by speaker match)
                        e1, e2 = split_key(eu)
                        if spk_of(e1) == spk_of(target):
                            src_utt, stream = e1, s1_dir
                        elif spk_of(e2) == spk_of(target):
                            src_utt, stream = e2, s2_dir
                        else:
                            raise KeyError(
                                f"enrollment mixture {eu} has no "
                                f"rendition of speaker {spk_of(target)} "
                                f"(target of {utt} s{idx})"
                            )
                        path = os.path.join(stream, eu + ".wav")
                        if not os.path.exists(path):
                            raise KeyError(
                                f"enrollment audio missing: {path} "
                                f"(from {mix2enroll_file})"
                            )
                        enroll_id = f"{src_utt}@{eu}"
                        extra_enroll[enroll_id] = path
                        maps[idx][utt] = (enroll_id, path)
                    else:
                        maps[idx][utt] = (eu, None)
            # bare enrollment ids must resolve against this split's
            # source pool (enroll_wav.scp keys) — fail at prep time, not
            # with a KeyError mid-decode
            avail = {u for pairs in spk2utts.values() for u, _ in pairs}
            unresolved = sorted({
                eu for idx in (1, 2)
                for eu, p in maps[idx].values()
                if p is None and eu not in avail
            })
            if unresolved:
                raise KeyError(
                    f"{len(unresolved)} enrollment utterances from "
                    f"{mix2enroll_file} are not source utterances of this "
                    f"split (e.g. {unresolved[:5]}); enroll_wav.scp can "
                    "only resolve same-split wsj0 utterance ids"
                )
        else:
            # deterministic enrollment: a DIFFERENT utterance of the same
            # speaker when one exists
            for utt in utts:
                u1, u2 = split_key(utt)
                for idx, u in ((1, u1), (2, u2)):
                    cands = [
                        (cu, p) for cu, p in spk2utts[spk_of(u)] if cu != u
                    ] or spk2utts[spk_of(u)]
                    maps[idx][utt] = rng.choice(cands)
        for idx in (1, 2):
            with open(os.path.join(out_dir, f"spk{idx}_enroll"), "w") as f:
                for utt, (eu, _) in sorted(maps[idx].items()):
                    f.write(f"{utt} {eu}\n")
        with open(os.path.join(out_dir, "enroll_wav.scp"), "w") as f:
            seen = set()
            for spk, pairs in spk2utts.items():
                for u, p in pairs:
                    if u not in seen:
                        f.write(f"{u} {p}\n")
                        seen.add(u)
            # mixture-scoped official enrollments (specific renditions)
            for u, p in sorted(extra_enroll.items()):
                f.write(f"{u} {p}\n")


def main():
    args = get_args()
    rng = random.Random(args.seed)
    m2e = dict(p.split(":", 1) for p in args.mix2enroll)
    for pair in args.splits:
        src, dst = pair.split(":")
        mix_dir = os.path.join(args.wsj0_2mix_dir, src)
        out_dir = os.path.join(args.out_dir, dst)
        print(f"preparing {src} -> {out_dir}")
        prepare_split(
            mix_dir, out_dir, rng, fixed_enroll=dst in ("dev", "test"),
            mix2enroll_file=m2e.get(dst),
        )


if __name__ == "__main__":
    main()
