#!/bin/bash
# Single-site MaPLe with the cross-dataset config.
# Usage: cross_data_train.sh <dataset> <seed>
DATA=${DATA:-$HOME/data}
TRAINER=MaPLe
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
