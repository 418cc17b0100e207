#!/bin/bash
# Shared helpers for the workload pipelines. Mirrors the sed-templating
# scheme of the reference (twke18/SPML bashscripts/voc12/*.sh:83-121) so
# the same environment-variable surface configures each stage.

render_config () {
  # render_config TEMPLATE OUT_PATH
  local template=$1
  local out=$2
  mkdir -p "$(dirname "${out}")"
  sed -e "s/TRAIN_SPLIT/${TRAIN_SPLIT}/g" \
    -e "s/BACKBONE_TYPES/${BACKBONE_TYPES}/g" \
    -e "s/PREDICTION_TYPES/${PREDICTION_TYPES}/g" \
    -e "s/EMBEDDING_DIM/${EMBEDDING_DIM}/g" \
    -e "s/GPUS/${GPUS}/g" \
    -e "s/BATCH_SIZE/${BATCH_SIZE}/g" \
    -e "s/LABEL_DIVISOR/${LABEL_DIVISOR:-2048}/g" \
    -e "s/USE_SYNCBN/${USE_SYNCBN}/g" \
    -e "s/LR_POLICY/${LR_POLICY}/g" \
    -e "s/SNAPSHOT_STEP/${SNAPSHOT_STEP}/g" \
    -e "s/MAX_ITERATION/${MAX_ITERATION}/g" \
    -e "s/WARMUP_ITERATION/${WARMUP_ITERATION}/g" \
    -e "s/LR/${LR}/g" \
    -e "s/WD/${WD}/g" \
    -e "s/MEMORY_BANK_SIZE/${MEMORY_BANK_SIZE}/g" \
    -e "s/KMEANS_ITERATIONS/${KMEANS_ITERATIONS}/g" \
    -e "s/KMEANS_NUM_CLUSTERS/${KMEANS_NUM_CLUSTERS}/g" \
    -e "s/TRAIN_CROP_SIZE/${CROP_SIZE}/g" \
    -e "s/TEST_SPLIT/${INFERENCE_SPLIT}/g" \
    -e "s/TEST_IMAGE_SIZE/${INFERENCE_IMAGE_SIZE}/g" \
    -e "s/TEST_CROP_SIZE_H/${INFERENCE_CROP_SIZE_H}/g" \
    -e "s/TEST_CROP_SIZE_W/${INFERENCE_CROP_SIZE_W}/g" \
    -e "s/TEST_STRIDE/${INFERENCE_STRIDE}/g" \
    -e "s#PRETRAINED#${PRETRAINED}#g" \
    -e "s#DATA_ROOT#${DATAROOT}#g" \
    -e "s#TRAIN_DATA_LIST#${TRAIN_DATA_LIST}#g" \
    -e "s#TEST_DATA_LIST#${TEST_DATA_LIST}#g" \
    -e "s/SEM_ANN_LOSS_TYPES/${SEM_ANN_LOSS_TYPES}/g" \
    -e "s/SEM_OCC_LOSS_TYPES/${SEM_OCC_LOSS_TYPES}/g" \
    -e "s/IMG_SIM_LOSS_TYPES/${IMG_SIM_LOSS_TYPES}/g" \
    -e "s/FEAT_AFF_LOSS_TYPES/${FEAT_AFF_LOSS_TYPES}/g" \
    -e "s/SEM_ANN_CONCENTRATION/${SEM_ANN_CONCENTRATION}/g" \
    -e "s/SEM_OCC_CONCENTRATION/${SEM_OCC_CONCENTRATION}/g" \
    -e "s/IMG_SIM_CONCENTRATION/${IMG_SIM_CONCENTRATION}/g" \
    -e "s/FEAT_AFF_CONCENTRATION/${FEAT_AFF_CONCENTRATION}/g" \
    -e "s/SEM_ANN_LOSS_WEIGHT/${SEM_ANN_LOSS_WEIGHT}/g" \
    -e "s/SEM_OCC_LOSS_WEIGHT/${SEM_OCC_LOSS_WEIGHT}/g" \
    -e "s/IMG_SIM_LOSS_WEIGHT/${IMG_SIM_LOSS_WEIGHT}/g" \
    -e "s/FEAT_AFF_LOSS_WEIGHT/${FEAT_AFF_LOSS_WEIGHT}/g" \
    -e "s/APPLY_FEAT_AFF/${APPLY_FEAT_AFF:-false}/g" \
    -e "s/BN_MOMENTUM/${BN_MOMENTUM:-3e-4}/g" \
    "${template}" > "${out}"
  cat "${out}"
}

CRF_FLAGS="--crf_iter_max 10 --crf_pos_w 3 --crf_pos_xy_std 1 --crf_bi_w 4 --crf_bi_xy_std 67 --crf_bi_rgb_std 3"
