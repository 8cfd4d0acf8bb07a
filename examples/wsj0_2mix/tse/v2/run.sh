#!/usr/bin/env bash
# WSJ0-2Mix TSE recipe, joint speaker-encoder training.
# Closes the reference's unchecked "[ ] WSJ0-2Mix" roadmap item
# (/root/reference/README.md) with the same staged pipeline as the
# Libri2Mix v2 recipe: prepare -> shards -> train -> average -> infer
# -> score. Single host process drives all local TPU chips through the
# mesh (multi-host: WESEP_DIST=1 + jax.distributed).
set -euo pipefail

stage=1
stop_stage=6
# the standard wsj0-mix tree from the MERL matlab/pywsj0-mix generators
wsj0_2mix_dir=/path/to/wsj0-mix/2speakers/wav16k/min
data=data
config=confs/bsrnn.yaml
exp_dir=$(python -c "import yaml,sys;print(yaml.safe_load(open('$config'))['exp_dir'])")
num_avg=2
gpus="" # unused on TPU; kept for CLI parity
# official BUT-speakerbeam fixed dev/test enrollment maps
# (speakerbeam egs/wsj0_2mix); set false to generate deterministic
# per-seed maps instead (NOT comparable with published TSE numbers)
use_official_enroll_maps=true

. ../../../../tools/parse_options.sh || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: prepare data lists + enrollment maps"
  m2e_args=""
  if ${use_official_enroll_maps}; then
    for pair in cv:dev tt:test; do
      src=${pair%%:*}; dset=${pair##*:}
      mkdir -p ${data}/${dset}
      # the maps are keyed by mixture ids, identical across the
      # wav8k/wav16k trees; try both egs dir spellings upstream
      if [ ! -s ${data}/${dset}/mixture2enrollment ]; then
        for eg in wsj0-2mix wsj0_2mix; do
          url="https://raw.githubusercontent.com/BUTSpeechFIT/speakerbeam/main/egs/${eg}/data/wav8k/min/${src}/map_mixture2enrollment"
          wget -q -O ${data}/${dset}/mixture2enrollment "$url" && break \
            || rm -f ${data}/${dset}/mixture2enrollment
        done
      fi
      [ -s ${data}/${dset}/mixture2enrollment ] || {
        echo "could not download map_mixture2enrollment; rerun with"
        echo "--use_official_enroll_maps false for generated maps"
        exit 1
      }
      m2e_args="${m2e_args} ${dset}:${data}/${dset}/mixture2enrollment"
    done
  fi
  python local/prepare_wsj0_2mix.py --wsj0_2mix_dir ${wsj0_2mix_dir} \
      --out_dir ${data} ${m2e_args:+--mix2enroll ${m2e_args}}
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
  ckpt=""
  latest=${exp_dir}/models/latest_checkpoint.ckpt
  [ -L ${latest} ] && ckpt="--checkpoint $(readlink -f ${latest})"
  python -m wesep_tpu.bin.train --config ${config} ${ckpt}
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
      --set test_spk2utt=${data}/test/enroll_wav.scp \
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
