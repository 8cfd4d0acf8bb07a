#!/usr/bin/env bash
# VoxCeleb1 online-mixing TSE recipe (TPU port of
# /root/reference/examples/voxceleb1/v2/run_online.sh): single-speaker
# shards + dynamic 2-speaker mixing with random SNR/reverb/noise;
# validation/test stay premixed Libri2Mix.
set -euo pipefail

stage=1
stop_stage=5
voxceleb_dir=/path/to/voxceleb1/wav
musan_dir=/path/to/musan
data=data
config=confs/bsrnn_online.yaml
exp_dir=$(python -c "import yaml,sys;print(yaml.safe_load(open('$config'))['exp_dir'])")
num_avg=2

. ../../../tools/parse_options.sh || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: prepare single-speaker lists + noise db"
  mkdir -p ${data}/train ${data}/musan
  find ${voxceleb_dir} -name '*.wav' | \
    awk -F/ '{spk=$(NF-2); key=spk"-"$(NF-1)"-"$NF; gsub(/\.wav$/,"",key);
              print key, $0}' | sort > ${data}/train/wav.scp
  awk '{split($1, a, "-"); print $1, a[1]}' ${data}/train/wav.scp \
    > ${data}/train/utt2spk
  python - <<'PY'
import json, collections
spk2utt = collections.defaultdict(list)
wav = dict(l.strip().split(None, 1) for l in open('data/train/wav.scp'))
for line in open('data/train/utt2spk'):
    utt, spk = line.split()
    spk2utt[spk].append((utt, wav[utt]))
json.dump(spk2utt, open('data/train/spk2enroll.json', 'w'))
PY
  if [ -d "${musan_dir}" ]; then
    find ${musan_dir} -name '*.wav' | \
      awk -F/ '{key=$(NF-2)"_"$NF; gsub(/\.wav$/,"",key); print key, $0}' \
      > ${data}/musan/noise.scp
    python -m wesep_tpu.tools.make_noise_db \
        ${data}/musan/noise.scp ${data}/musan/noise.pack
  fi
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: single-speaker shards"
  python -m wesep_tpu.tools.make_shard_online \
      --num_utts_per_shard 1000 --num_threads 8 --shuffle \
      ${data}/train/wav.scp ${data}/train/utt2spk \
      ${data}/train/shards ${data}/train/shards.list
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: train with online mixing"
  python -m wesep_tpu.bin.train --config ${config}
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: average checkpoints"
  python -m wesep_tpu.bin.average_model \
      --dst_model ${exp_dir}/models/avg_model.ckpt \
      --src_path ${exp_dir}/models --num ${num_avg}
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "stage 5: inference on premixed Libri2Mix test"
  python -m wesep_tpu.bin.infer --config ${config} \
      --set checkpoint=${exp_dir}/models/avg_model.ckpt \
      --set test_data=${data}/test/shards.list \
      --set test_spk2utt=${data}/test/enroll_wav.scp \
      --set test_spk1_enroll=${data}/test/spk1_enroll \
      --set test_spk2_enroll=${data}/test/spk2_enroll
fi
