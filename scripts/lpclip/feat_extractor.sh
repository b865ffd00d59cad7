#!/bin/bash
# Extract frozen CLIP features for the linear-probe pipeline.
# Usage: DATA=/path/to/datasets feat_extractor.sh [dataset ...]
DATA=${DATA:-$HOME/data}
OUTPUT=${OUTPUT:-./clip_feat}
SEED=${SEED:-1}
DATASETS=${@:-oxford_pets}

for DATASET in ${DATASETS}; do
  for SPLIT in train val test; do
    python tools/lpclip/feat_extractor.py \
        --split ${SPLIT} \
        --root ${DATA} \
        --seed ${SEED} \
        --dataset-config-file configs/datasets/${DATASET}.yaml \
        --output-dir ${OUTPUT}
  done
done
