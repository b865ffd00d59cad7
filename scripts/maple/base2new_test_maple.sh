#!/bin/bash
# Base-to-novel: evaluate on the held-out "new" half.
# Usage: base2new_test_maple.sh <dataset> <seed> [extra cfg opts...]
# CFG/SHOTS/LOADEP/OUTROOT env-overridable (defaults match the reference).
DATA=${DATA:-$HOME/data}
TRAINER=MaPLe
DATASET=$1
SEED=$2
CFG=${CFG:-vit_b16_c2_ep5_batch4_2ctx}
SHOTS=${SHOTS:-16}
LOADEP=${LOADEP:-9}
SUB=new

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
MODEL_DIR=${OUTROOT:-output}/base2new/train_base/${COMMON_DIR}
DIR=${OUTROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    --model-dir ${MODEL_DIR} \
    --load-epoch ${LOADEP} \
    --eval-only \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    "${@:3}"
