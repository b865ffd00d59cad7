#!/bin/bash
# Few-shot logistic-regression probe over extracted CLIP features.
# Usage: linear_probe.sh [DatasetName ...]
FEAT_DIR=${FEAT_DIR:-./clip_feat}
DATASETS=${@:-OxfordPets}

for DATASET in ${DATASETS}; do
  python tools/lpclip/linear_probe.py \
      --dataset ${DATASET} \
      --feature_dir ${FEAT_DIR} \
      --num_step 8 \
      --num_run 10
done
