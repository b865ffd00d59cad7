#!/bin/bash
# Cross-dataset reproduction: evaluate published/trained MaPLe weights on a
# target dataset (reference scripts/maple/reproduce_maple_xd.sh contract).
# Usage: reproduce_maple_xd.sh <dataset> <seed> <weights_dir>
DATA=${DATA:-$HOME/data}
TRAINER=MaPLe
DATASET=$1
SEED=$2
WEIGHTSPATH=$3
CFG=vit_b16_c2_ep5_batch4_2ctx_cross_datasets
SHOTS=16
LOADEP=2

MODEL_DIR=${WEIGHTSPATH}/seed${SEED}
DIR=output/evaluation/${TRAINER}/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}
if [ -d "$DIR" ]; then
  echo "Results are already available in ${DIR}. Skipping..."
else
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
      DATASET.NUM_SHOTS ${SHOTS}
fi
