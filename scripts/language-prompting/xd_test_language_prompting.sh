#!/bin/bash
# Cross-dataset / domain-generalization evaluation of an ImageNet-trained model.
# Usage: xd_test_language_prompting.sh <dataset> <seed>
DATA=${DATA:-$HOME/data}
TRAINER=IVLP
DATASET=$1
SEED=$2
CFG=vit_b16_c2_ep5_batch4_4ctx_language_only
SHOTS=16

DIR=output/evaluation/${TRAINER}/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    --model-dir output/imagenet/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED} \
    --load-epoch 5 \
    --eval-only
