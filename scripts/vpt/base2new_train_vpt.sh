#!/bin/bash
# Usage: base2new_train_vpt.sh <dataset> <seed>
DATA=${DATA:-$HOME/data}
TRAINER=VPT
DATASET=$1
SEED=$2
CFG=vit_b16_c2_ep5_batch4_4
SHOTS=16

DIR=output/base2new/train_base/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES base
