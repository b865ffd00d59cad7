#!/bin/bash
# Base-to-novel: train on base classes (16-shot).
# Usage: base2new_train_maple.sh <dataset> <seed> [extra cfg opts...]
# CFG/SHOTS/OUTROOT env-overridable (defaults match the reference run).
DATA=${DATA:-$HOME/data}
TRAINER=MaPLe
DATASET=$1
SEED=$2
CFG=${CFG:-vit_b16_c2_ep5_batch4_2ctx}
SHOTS=${SHOTS:-16}

DIR=${OUTROOT:-output}/base2new/train_base/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
if [ -d "$DIR" ]; then
    echo "Results are available in ${DIR}. Resuming..."
fi
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES base \
    "${@:3}"
