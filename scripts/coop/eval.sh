#!/bin/bash
# Evaluate trained CoOp prompts on a (shifted) dataset.
# Usage: eval.sh <dataset> <seed> <model_dir> <load_epoch> <cfg>
DATA=${DATA:-$HOME/data}
TRAINER=CoOp
DATASET=$1
SEED=$2
MODEL_DIR=$3
LOADEP=$4
CFG=$5

DIR=output/evaluation/${TRAINER}/${CFG}/${DATASET}/seed${SEED}
python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    --model-dir ${MODEL_DIR} \
    --load-epoch ${LOADEP} \
    --eval-only
