#!/usr/bin/env bash
# Scoring orchestration (counterpart of the reference tools/score.sh):
# split keys into N jobs, score each in parallel, merge + average.
# The kaldi run.pl fan-out is replaced by plain background jobs.
set -euo pipefail

nj=4
use_pesq=false
use_dnsmos=false

. "$(dirname "$0")/parse_options.sh" || true

if [ $# -ne 4 ]; then
  echo "usage: $0 [--nj N] <key_file> <ref_scp_csv> <inf_scp_csv> <out_dir>"
  echo "  e.g. $0 keys.scp ref1.scp,ref2.scp inf1.scp,inf2.scp score_out"
  exit 1
fi

key_file=$1
ref_scps=${2//,/ }
inf_scps=${3//,/ }
out_dir=$4

mkdir -p "${out_dir}/split"
total=$(wc -l < "${key_file}")
per=$(( (total + nj - 1) / nj ))
split -l ${per} -d "${key_file}" "${out_dir}/split/keys."

pids=()
i=0
extra=""
[ "${use_pesq}" = "true" ] && extra="${extra} --use_pesq"
for part in "${out_dir}"/split/keys.*; do
  python -m wesep_tpu.bin.score \
    --output_dir "${out_dir}/job${i}" \
    --key_file "${part}" \
    --ref_scp ${ref_scps} \
    --inf_scp ${inf_scps} ${extra} &
  pids+=($!)
  i=$((i + 1))
done
for pid in "${pids[@]}"; do wait "${pid}"; done

# merge per-metric files and recompute averages
python - "$out_dir" <<'PY'
import os, sys
from collections import defaultdict
out = sys.argv[1]
jobs = sorted(d for d in os.listdir(out) if d.startswith("job"))
merged = defaultdict(list)
for job in jobs:
    for name in os.listdir(os.path.join(out, job)):
        if name == "RESULTS":
            continue
        with open(os.path.join(out, job, name)) as f:
            merged[name].extend(f.read().splitlines())
sums = defaultdict(float); counts = defaultdict(int)
for name, lines in merged.items():
    with open(os.path.join(out, name), "w") as f:
        f.write("\n".join(sorted(lines)) + "\n")
    metric = name.rsplit("_spk", 1)[0]
    for line in lines:
        try:
            v = float(line.split()[1])
        except (IndexError, ValueError):
            continue
        if v == v:  # not NaN
            sums[metric] += v; counts[metric] += 1
with open(os.path.join(out, "RESULTS"), "w") as f:
    for metric in sorted(sums):
        avg = sums[metric] / max(counts[metric], 1)
        f.write(f"{metric}: {avg:.4f}\n")
        print(f"{metric}: {avg:.4f}")
PY
