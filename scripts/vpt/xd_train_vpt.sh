#!/bin/bash
# Cross-dataset: train on ImageNet (all classes, 16-shot).
# Usage: xd_train_vpt.sh <seed>
DATA=${DATA:-$HOME/data}
TRAINER=VPT
SEED=$1
CFG=vit_b16_c2_ep5_batch4_4
SHOTS=16

DIR=output/imagenet/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED}
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/imagenet.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    DATASET.NUM_SHOTS ${SHOTS}
