#!/usr/bin/env bash
# Mirrors the reference scripts/train.sh surface:
#   bash scripts/train.sh MODEL_TYPE TEMP LAMBDA WORKDIR FEAT_DIR DUR_FILE
set -euo pipefail

model_type=${1:?model_type: vivt|viv|vi|v}
temperature=${2:-0.5}
lam=${3:-0.5}
workdir=${4:?workdir}
v_feat_dir=${5:?feature dir}
dur_file=${6:?duration csv}

dset_name="yc2"
data_dir="./densevid_eval/${dset_name}_data"

python -m svpc_tpu.cli.train \
  --model_type "${model_type}" \
  --data_dir "${data_dir}" \
  --video_feature_dir "${v_feat_dir}" \
  --duration_file "${dur_file}" \
  --word2idx_path "./cache/${dset_name}_word2idx.json" \
  --verb2idx_path "./cache/bosselut_verb_vocab.json" \
  --glove_path "./cache/${dset_name}_vocab_glove.pt" \
  --verb_glove_path "./cache/bosselut_${dset_name}_verb_vocab_glove.pt" \
  --temperature "${temperature}" \
  --lam "${lam}" \
  --max_n_sen 12 --max_t_len 22 --max_v_len 100 \
  --workdir "${workdir}"
