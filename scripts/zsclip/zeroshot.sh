#!/bin/bash
# Zero-shot CLIP evaluation.
# Usage: zeroshot.sh <dataset> <cfg e.g. vit_b16>
DATA=${DATA:-$HOME/data}
TRAINER=ZeroshotCLIP
DATASET=$1
CFG=$2

python train.py \
    --root ${DATA} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoOp/${CFG}.yaml \
    --output-dir output/${TRAINER}/${CFG}/${DATASET} \
    --eval-only
