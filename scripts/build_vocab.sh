#!/usr/bin/env bash
# Mirrors the reference scripts/build_vocab.sh:
#   bash scripts/build_vocab.sh /path/to/glove.6B.300d.txt
set -euo pipefail

glove_path=${1:?glove.6B.300d.txt path}

python -m svpc_tpu.cli.build_vocab \
  --train_path "./densevid_eval/yc2_data/bosselut_yc2_train_anet_format.json" \
  --cache ./cache \
  --min_word_count 3 \
  --raw_glove_path "${glove_path}" \
  --verb_vocab_path "./densevid_eval/yc2_data/bosselut_verb_vocab.json"
