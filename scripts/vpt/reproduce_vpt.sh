#!/bin/bash
# Reproduction run for deep Vision Prompt Tuning weights.
# Usage: reproduce_vpt.sh <dataset> <seed> <weights_dir>
DATA=${DATA:-$HOME/data}
TRAINER=VPT
DATASET=$1
SEED=$2
WEIGHTSPATH=$3
CFG=vit_b16_c2_ep5_batch4_4
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
