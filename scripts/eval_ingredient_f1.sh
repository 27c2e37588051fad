#!/usr/bin/env bash
# Mirrors the reference scripts/eval_ingredient_f1.sh: standalone
# ingredient-F1 scoring of an existing prediction JSON.
#   bash scripts/eval_ingredient_f1.sh MODEL_TYPE CAPTION_JSON [DATA_DIR]
set -euo pipefail

model_type=${1:?model_type: vivt|viv|vi|v}
caption_path=${2:?prediction json (e.g. .../greedy_pred_test.json)}
data_dir=${3:-./densevid_eval/yc2_data}

echo "---------------------------------------------------------"
echo ">>>>>>>> Running evaluating ingredient f1 (test set)"
echo "---------------------------------------------------------"

python -m svpc_tpu.evaluation.ingredient_f1 \
  --model_name "${model_type}" \
  --caption_path "${caption_path}" \
  --data_dir "${data_dir}"
