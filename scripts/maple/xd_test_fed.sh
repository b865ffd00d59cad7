#!/bin/bash
# Evaluate a federated aggregator checkpoint on a target dataset.
# Usage: xd_test_fed.sh <dataset> <seed> <model_dir>
DATA=${DATA:-$HOME/data}
TRAINER=MaPLeFederated
DATASET=$1
SEED=$2
MODEL_DIR=$3
CFG=vit_b16_c2_ep5_batch4_2ctx_cross_datasets

DIR=output/evaluation_fed/${TRAINER}/${CFG}/${DATASET}/seed${SEED}
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    --model-dir ${MODEL_DIR} \
    --eval-only
