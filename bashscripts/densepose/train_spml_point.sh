#!/bin/bash
# SPML on DensePose (MSCOCO) with point supervision.
#
# Usage (from the repo root):
#   source bashscripts/densepose/train_spml_point.sh
#
# Behavioral reference: twke18/SPML bashscripts/densepose/train_spml_point.sh (same stage
# flags, env-var surface and snapshot/file layout).

source bashscripts/common.sh

BACKBONE_TYPES=${BACKBONE_TYPES:-panoptic_pspnet_101_densepose}
EMBEDDING_DIM=${EMBEDDING_DIM:-32}

PREDICTION_TYPES=${PREDICTION_TYPES:-segsort}
TRAIN_SPLIT=${TRAIN_SPLIT:-train2014}
GPUS=${GPUS:-0}
LR_POLICY=${LR_POLICY:-poly}
USE_SYNCBN=${USE_SYNCBN:-true}
SNAPSHOT_STEP=${SNAPSHOT_STEP:-45000}
MAX_ITERATION=${MAX_ITERATION:-45000}
WARMUP_ITERATION=${WARMUP_ITERATION:-100}
LR=${LR:-3e-3}
WD=${WD:-5e-4}
BATCH_SIZE=${BATCH_SIZE:-4}
CROP_SIZE=${CROP_SIZE:-512}
MEMORY_BANK_SIZE=${MEMORY_BANK_SIZE:-0}
KMEANS_ITERATIONS=${KMEANS_ITERATIONS:-10}
KMEANS_NUM_CLUSTERS=${KMEANS_NUM_CLUSTERS:-12}
SEM_ANN_LOSS_TYPES=${SEM_ANN_LOSS_TYPES:-segsort}
SEM_OCC_LOSS_TYPES=${SEM_OCC_LOSS_TYPES:-none}
IMG_SIM_LOSS_TYPES=${IMG_SIM_LOSS_TYPES:-segsort}
FEAT_AFF_LOSS_TYPES=${FEAT_AFF_LOSS_TYPES:-segsort}
SEM_ANN_CONCENTRATION=${SEM_ANN_CONCENTRATION:-6}
SEM_OCC_CONCENTRATION=${SEM_OCC_CONCENTRATION:-0}
IMG_SIM_CONCENTRATION=${IMG_SIM_CONCENTRATION:-16}
FEAT_AFF_CONCENTRATION=${FEAT_AFF_CONCENTRATION:-12}
SEM_ANN_LOSS_WEIGHT=${SEM_ANN_LOSS_WEIGHT:-1.0}
SEM_OCC_LOSS_WEIGHT=${SEM_OCC_LOSS_WEIGHT:-0.0}
IMG_SIM_LOSS_WEIGHT=${IMG_SIM_LOSS_WEIGHT:-0.1}
FEAT_AFF_LOSS_WEIGHT=${FEAT_AFF_LOSS_WEIGHT:-0.5}
# The reference carries the same aff 12 / 0.5 config but its effective
# objective never invokes feat_aff_loss (segsort_softmax_densepose.py:
# 64-68 construct it, :195-254 never call it). Default false matches
# that shipped behavior; set true for the paper-semantics term.
APPLY_FEAT_AFF=${APPLY_FEAT_AFF:-false}

INFERENCE_SPLIT=${INFERENCE_SPLIT:-minival2014}
INFERENCE_IMAGE_SIZE=${INFERENCE_IMAGE_SIZE:-640}
INFERENCE_CROP_SIZE_H=${INFERENCE_CROP_SIZE_H:-640}
INFERENCE_CROP_SIZE_W=${INFERENCE_CROP_SIZE_W:-640}
INFERENCE_STRIDE=${INFERENCE_STRIDE:-640}

SNAPSHOT_DIR=${SNAPSHOT_DIR:-snapshots/densepose_point/${BACKBONE_TYPES}_${PREDICTION_TYPES}/p${CROP_SIZE}_dim${EMBEDDING_DIM}_nc${KMEANS_NUM_CLUSTERS}_bs${BATCH_SIZE}_it${MAX_ITERATION}}
echo ${SNAPSHOT_DIR}

export PYTHONPATH=`pwd`:$PYTHONPATH

DATAROOT=${DATAROOT:-/data/coco_densepose}
PRETRAINED=${PRETRAINED:-snapshots/imagenet/trained/resnet-101-cuhk.pth}
TRAIN_DATA_LIST=${TRAIN_DATA_LIST:-datasets/densepose/panoptic_${TRAIN_SPLIT}_points_pmi0.1_256.txt}
TEST_DATA_LIST=${TEST_DATA_LIST:-datasets/densepose/panoptic_${INFERENCE_SPLIT}.txt}
MEMORY_DATA_LIST=${MEMORY_DATA_LIST:-datasets/densepose/panoptic_${TRAIN_SPLIT}_sub.txt}

IS_CONFIG_EMB=${IS_CONFIG_EMB:-1}
IS_TRAIN_EMB=${IS_TRAIN_EMB:-1}
IS_CONFIG_CLASSIFIER=${IS_CONFIG_CLASSIFIER:-1}
IS_ANNOTATION_1=${IS_ANNOTATION_1:-1}
IS_TRAIN_CLASSIFIER_1=${IS_TRAIN_CLASSIFIER_1:-1}
IS_INFERENCE_CLASSIFIER_1=${IS_INFERENCE_CLASSIFIER_1:-1}
IS_BENCHMARK_CLASSIFIER_1=${IS_BENCHMARK_CLASSIFIER_1:-1}

if [ ${IS_CONFIG_EMB} -eq 1 ]; then
  render_config configs/densepose_template.yaml ${SNAPSHOT_DIR}/config_emb.yaml
fi

if [ ${IS_TRAIN_EMB} -eq 1 ]; then
  python3 pyscripts/train/train_densepose.py     --data_dir ${DATAROOT}     --data_list ${TRAIN_DATA_LIST}     --snapshot_dir ${SNAPSHOT_DIR}/stage1     --cfg_path ${SNAPSHOT_DIR}/config_emb.yaml

  python3 pyscripts/inference/prototype.py     --data_dir ${DATAROOT}     --data_list ${MEMORY_DATA_LIST}     --snapshot_dir ${SNAPSHOT_DIR}/stage1     --save_dir ${SNAPSHOT_DIR}/stage1/results/${TRAIN_SPLIT}     --kmeans_num_clusters 24,24     --label_divisor 2048     --cfg_path ${SNAPSHOT_DIR}/config_emb.yaml

  python3 pyscripts/inference/inference.py     --data_dir ${DATAROOT}     --data_list ${TEST_DATA_LIST}     --snapshot_dir ${SNAPSHOT_DIR}/stage1     --save_dir ${SNAPSHOT_DIR}/stage1/results/${INFERENCE_SPLIT}     --semantic_memory_dir ${SNAPSHOT_DIR}/stage1/results/${TRAIN_SPLIT}/semantic_prototype     --kmeans_num_clusters 24,24     --label_divisor 2048     --cfg_path ${SNAPSHOT_DIR}/config_emb.yaml

  python3 pyscripts/benchmark/benchmark_by_mIoU.py     --pred_dir ${SNAPSHOT_DIR}/stage1/results/${INFERENCE_SPLIT}/semantic_gray     --gt_dir ${DATAROOT}/segcls/densepose/gray     --num_classes 15

  python3 pyscripts/inference/inference_softmax.py     --data_dir ${DATAROOT}     --data_list ${TEST_DATA_LIST}     --snapshot_dir ${SNAPSHOT_DIR}/stage1     --save_dir ${SNAPSHOT_DIR}/stage1/results/${INFERENCE_SPLIT}_softmax     --cfg_path ${SNAPSHOT_DIR}/config_emb.yaml

  python3 pyscripts/benchmark/benchmark_by_mIoU.py     --pred_dir ${SNAPSHOT_DIR}/stage1/results/${INFERENCE_SPLIT}_softmax/semantic_gray     --gt_dir ${DATAROOT}/segcls/densepose/gray     --num_classes 15
fi

if [ ${IS_CONFIG_CLASSIFIER} -eq 1 ]; then
  PRETRAINED=${SNAPSHOT_DIR}/stage1   PREDICTION_TYPES=softmax_classifier   BATCH_SIZE=${CLS_BATCH_SIZE:-16} MAX_ITERATION=${CLS_MAX_ITERATION:-4000} KMEANS_ITERATIONS=0 KMEANS_NUM_CLUSTERS=1   render_config configs/densepose_template.yaml ${SNAPSHOT_DIR}/config_classifier.yaml
fi

if [ ${IS_ANNOTATION_1} -eq 1 ]; then
  PSEUDO1=${SNAPSHOT_DIR}/stage1/pseudo_labels/${TRAIN_SPLIT}_cam_rw
  python3 pyscripts/inference/pseudo_denseposerw_crf.py \
    --data_dir ${DATAROOT} \
    --data_list ${TRAIN_DATA_LIST} \
    --snapshot_dir ${SNAPSHOT_DIR}/stage1 \
    --save_dir ${PSEUDO1} \
    --kmeans_num_clusters 24,24 \
    --label_divisor 2048 \
    ${CRF_FLAGS} \
    --cfg_path ${SNAPSHOT_DIR}/config_emb.yaml

  python3 pyscripts/benchmark/benchmark_by_mIoU.py \
    --pred_dir ${PSEUDO1}/semantic_gray \
    --gt_dir ${DATAROOT}/segcls/densepose/gray \
    --num_classes 15

  sed -e "s#segcls\/densepose_points\/gray#$(readlink -m ${PSEUDO1})\/semantic_gray#g" \
    -e "s#images#${DATAROOT}\/images#g" \
    -e "s#seginst#${DATAROOT}\/seginst#g" \
    ${TRAIN_DATA_LIST} > ${PSEUDO1}/list.txt
fi

if [ ${IS_TRAIN_CLASSIFIER_1} -eq 1 ]; then
  python3 pyscripts/train/train_densepose_classifier.py \
    --data_dir ${HOME} \
    --data_list ${SNAPSHOT_DIR}/stage1/pseudo_labels/${TRAIN_SPLIT}_cam_rw/list.txt \
    --snapshot_dir ${SNAPSHOT_DIR}/softmax_classifier_stage1 \
    --cfg_path ${SNAPSHOT_DIR}/config_classifier.yaml
fi

if [ ${IS_INFERENCE_CLASSIFIER_1} -eq 1 ]; then
  python3 pyscripts/inference/inference_softmax.py \
    --data_dir ${DATAROOT} \
    --data_list ${TEST_DATA_LIST} \
    --snapshot_dir ${SNAPSHOT_DIR}/softmax_classifier_stage1 \
    --save_dir ${SNAPSHOT_DIR}/softmax_classifier_stage1/results/${INFERENCE_SPLIT} \
    ${CRF_FLAGS} \
    --cfg_path ${SNAPSHOT_DIR}/config_classifier.yaml
fi

if [ ${IS_BENCHMARK_CLASSIFIER_1} -eq 1 ]; then
  python3 pyscripts/benchmark/benchmark_by_mIoU.py \
    --pred_dir ${SNAPSHOT_DIR}/softmax_classifier_stage1/results/${INFERENCE_SPLIT}/semantic_gray \
    --gt_dir ${DATAROOT}/segcls/densepose/gray \
    --num_classes 15
fi
