#!/usr/bin/env bash
# Mirrors the reference scripts/eval_caption.sh: test-split decode + metrics.
#   bash scripts/eval_caption.sh MODEL_TYPE CHECKPOINT FEAT_DIR DUR_FILE OUT_DIR
set -euo pipefail

model_type=${1:?model_type: vivt|viv|vi|v}
checkpoint=${2:?checkpoint dir (or .chkpt with --torch_checkpoint edits)}
v_feat_dir=${3:?feature dir}
dur_file=${4:?duration csv}
out_dir=${5:?output dir}

dset_name="yc2"

python -m svpc_tpu.cli.evaluate \
  --model_type "${model_type}" \
  --data_dir "./densevid_eval/${dset_name}_data" \
  --video_feature_dir "${v_feat_dir}" \
  --duration_file "${dur_file}" \
  --word2idx_path "./cache/${dset_name}_word2idx.json" \
  --verb2idx_path "./cache/bosselut_verb_vocab.json" \
  --checkpoint "${checkpoint}" \
  --split test --ingredient_f1 \
  --max_n_sen 12 --max_t_len 22 --max_v_len 100 \
  --output_dir "${out_dir}"
