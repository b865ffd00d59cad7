#!/bin/bash
# Reproduction run for deep Language Prompting weights.
# Usage: reproduce_language_prompting.sh <dataset> <seed> <weights_dir>
DATA=${DATA:-$HOME/data}
TRAINER=IVLP
DATASET=$1
SEED=$2
WEIGHTSPATH=$3
CFG=vit_b16_c2_ep5_batch4_4ctx_language_only
SHOTS=16
LOADEP=5

for SUB in base new; do
  DIR=output/base2new/reproduce_${SUB}/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
  python train.py \
      --root ${DATA} \
      --seed ${SEED} \
      --trainer ${TRAINER} \
      --dataset-config-file configs/datasets/${DATASET}.yaml \
      --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
      --output-dir ${DIR} \
      --model-dir ${WEIGHTSPATH} \
      --load-epoch ${LOADEP} \
      --eval-only \
      DATASET.NUM_SHOTS ${SHOTS} \
      DATASET.SUBSAMPLE_CLASSES ${SUB}
done
