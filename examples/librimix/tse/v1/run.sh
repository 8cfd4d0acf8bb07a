#!/usr/bin/env bash
# Libri2Mix TSE recipe with PRE-EXTRACTED speaker embeddings (v1).
# TPU port of /root/reference/examples/librimix/tse/v1/run.sh: stage 2
# extracts embeddings with an in-repo speaker encoder (replacing the
# external wespeaker onnx extractor) into kaldi embed.ark/scp; training
# uses joint_training=false.
set -euo pipefail

stage=1
stop_stage=6
librimix_dir=/path/to/Libri2Mix/wav16k/min
data=data
config=confs/bsrnn.yaml
spk_ckpt=/path/to/speaker_encoder.ckpt
spk_model=ResNet34
exp_dir=$(python -c "import yaml,sys;print(yaml.safe_load(open('$config'))['exp_dir'])")
num_avg=2
# MetricGAN fine-tuning (reference v1/run.sh:22,74-75): set true with
# config=confs/dpcc_init_gan.yaml after a converged dpccn run
use_gan_loss=false
use_official_enroll_maps=true

. ../../../../tools/parse_options.sh || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: prepare data lists"
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
  python ../v2/local/prepare_librimix.py --librimix_dir ${librimix_dir} \
      --out_dir ${data} ${m2e_args:+--mix2enroll ${m2e_args}}
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: extract speaker embeddings"
  for part in train dev test; do
    # one wav per source utterance
    awk '{print $1, $2}' ${data}/${part}/enroll_wav.scp 2>/dev/null || \
      cp ${data}/${part}/wav.scp ${data}/${part}/enroll_wav.scp
    python -m wesep_tpu.tools.extract_embed \
        --wav_scp ${data}/${part}/enroll_wav.scp \
        --checkpoint ${spk_ckpt} --spk_model ${spk_model} \
        --spk_args '{"embed_dim": 256, "pooling_func": "TSTP", "two_emb_layer": false}' \
        --out_base ${data}/${part}/embed
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: shards + train (joint_training=false)"
  for part in train dev test; do
    python -m wesep_tpu.tools.make_shard_list_premix \
        --num_utts_per_shard 1000 --num_threads 8 --shuffle \
        ${data}/${part}/wav.scp \
        ${data}/${part}/spk1.scp,${data}/${part}/spk2.scp \
        ${data}/${part}/utt2spks \
        ${data}/${part}/shards ${data}/${part}/shards.list
  done
  train_module=wesep_tpu.bin.train
  ${use_gan_loss} && train_module=wesep_tpu.bin.train_gan
  python -m ${train_module} --config ${config} \
      --set train_spk_embeds=${data}/train/embed.scp \
      --set val_spk_embeds=${data}/dev/embed.scp
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  python -m wesep_tpu.bin.average_model \
      --dst_model ${exp_dir}/models/avg_model.ckpt \
      --src_path ${exp_dir}/models --num ${num_avg}
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  python -m wesep_tpu.bin.infer --config ${config} \
      --set checkpoint=${exp_dir}/models/avg_model.ckpt \
      --set test_data=${data}/test/shards.list \
      --set test_spk_embeds=${data}/test/embed.scp \
      --set test_spk1_enroll=${data}/test/spk1_enroll \
      --set test_spk2_enroll=${data}/test/spk2_enroll
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  python -m wesep_tpu.bin.score \
      --output_dir ${exp_dir}/score \
      --key_file ${data}/test/wav.scp \
      --ref_scp ${data}/test/spk1.scp ${data}/test/spk2.scp \
      --inf_scp ${exp_dir}/audio/spk1.scp ${exp_dir}/audio/spk2.scp
  cat ${exp_dir}/score/RESULTS
fi
