#!/usr/bin/env bash
# Libri2Mix TSE recipe, joint speaker-encoder training (v2).
# TPU port of /root/reference/examples/librimix/tse/v2/run.sh: same staged
# pipeline (prepare -> shards -> train -> average -> infer -> score);
# torchrun is replaced by a single host process driving all local TPU
# chips through the mesh (multi-host: WESEP_DIST=1 + jax.distributed).
set -euo pipefail

stage=1
stop_stage=6
librimix_dir=/path/to/Libri2Mix/wav16k/min
musan_dir=/path/to/musan
data=data
config=confs/bsrnn.yaml
exp_dir=$(python -c "import yaml,sys;print(yaml.safe_load(open('$config'))['exp_dir'])")
num_avg=2
gpus="" # unused on TPU; kept for CLI parity
# MetricGAN fine-tuning (reference v2/run.sh:22,75-76): set true with
# e.g. config=confs/dpcc_init_gan.yaml after a converged stage-3 run
use_gan_loss=false
# official BUT-speakerbeam fixed dev/test enrollment maps (reference
# local/prepare_data.sh:60-67); set false to generate deterministic
# per-seed maps instead (NOT comparable with published numbers)
use_official_enroll_maps=true

. ../../../../tools/parse_options.sh || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: prepare data lists + enrollment maps + noise db"
  m2e_args=""
  if ${use_official_enroll_maps}; then
    for dset in dev test; do
      url="https://raw.githubusercontent.com/BUTSpeechFIT/speakerbeam/main/egs/libri2mix/data/wav8k/min/${dset}/map_mixture2enrollment"
      mkdir -p ${data}/${dset}
      [ -s ${data}/${dset}/mixture2enrollment ] || \
        wget -O ${data}/${dset}/mixture2enrollment "$url"
      m2e_args="${m2e_args} ${dset}:${data}/${dset}/mixture2enrollment"
    done
  fi
  python local/prepare_librimix.py --librimix_dir ${librimix_dir} \
      --out_dir ${data} ${m2e_args:+--mix2enroll ${m2e_args}}
  if [ -d "${musan_dir}" ]; then
    find ${musan_dir} -name '*.wav' | \
      awk -F/ '{key=$(NF-2)"_"$NF; gsub(/\.wav$/,"",key); print key, $0}' \
      > ${data}/musan/noise.scp
    python -m wesep_tpu.tools.make_noise_db \
        ${data}/musan/noise.scp ${data}/musan/noise.pack
  fi
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: build tar shards"
  for part in train dev test; do
    python -m wesep_tpu.tools.make_shard_list_premix \
        --num_utts_per_shard 1000 --num_threads 8 --shuffle \
        ${data}/${part}/wav.scp \
        ${data}/${part}/spk1.scp,${data}/${part}/spk2.scp \
        ${data}/${part}/utt2spks \
        ${data}/${part}/shards ${data}/${part}/shards.list
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: train"
  train_module=wesep_tpu.bin.train
  ${use_gan_loss} && train_module=wesep_tpu.bin.train_gan
  ckpt=""
  latest=${exp_dir}/models/latest_checkpoint.ckpt
  [ -L ${latest} ] && ckpt="--checkpoint $(readlink -f ${latest})"
  python -m ${train_module} --config ${config} ${ckpt}
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: average the last ${num_avg} checkpoints"
  python -m wesep_tpu.bin.average_model \
      --dst_model ${exp_dir}/models/avg_model.ckpt \
      --src_path ${exp_dir}/models --num ${num_avg}
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "stage 5: inference on the test set"
  python -m wesep_tpu.bin.infer --config ${config} \
      --set checkpoint=${exp_dir}/models/avg_model.ckpt \
      --set test_data=${data}/test/shards.list \
      --set test_spk2utt=${data}/test/single.utt2spk \
      --set test_spk1_enroll=${data}/test/spk1_enroll \
      --set test_spk2_enroll=${data}/test/spk2_enroll
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "stage 6: scoring"
  audio_dir=${exp_dir}/audio
  python -m wesep_tpu.bin.score \
      --output_dir ${exp_dir}/score \
      --key_file ${data}/test/wav.scp \
      --ref_scp ${data}/test/spk1.scp ${data}/test/spk2.scp \
      --inf_scp ${audio_dir}/spk1.scp ${audio_dir}/spk2.scp
  cat ${exp_dir}/score/RESULTS
fi
