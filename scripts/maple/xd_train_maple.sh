#!/bin/bash
# Federated cross-dataset training (PatternNet + UCMerced clients).
# Usage: xd_train_maple.sh <dataset> <seed>
DATA=${DATA:-$HOME/data}
TRAINER=MaPLeFederated
DATASET=$1
SEED=$2
CFG=vit_b16_c2_ep5_batch4_2ctx_cross_datasets
SHOTS=16

DIR=output/${DATASET}/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED}
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    DATASET.NUM_SHOTS ${SHOTS}
