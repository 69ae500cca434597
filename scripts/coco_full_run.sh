#!/usr/bin/env bash
# The canonical end-to-end COCO 30-shot LVC run (mirrors the reference
# scripts/coco_full_run.sh 18-command chain and docs/TRAIN_FULL.md).
# One process drives all local TPU devices; --num-gpus is accepted for CLI
# compatibility and ignored.
set -e

CKPT=checkpoints/coco/faster_rcnn
UBBR=checkpoints/coco/cascade_ubbr
FT=$CKPT/faster_rcnn_R_50_FPN_ft_all_30shot_aug_ftmore_dropout

##### BASELINE (TFA-style) TRAINING

# 1. base training on the 60 seen classes
python -m tools.train_net \
    --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_base.yaml

# 2. remove the final classifier/regressor for novel finetuning
python -m tools.ckpt_surgery \
    --method remove --coco \
    --src1 $CKPT/faster_rcnn_R_50_FPN_base/model_final.ckpt \
    --save-dir $CKPT/faster_rcnn_R_50_FPN_base/

# 3. learn classifier/regressor on the novel shots
python -m tools.train_net \
    --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_ft_novel_30shot.yaml

# 4. combine base + novel heads
python -m tools.ckpt_surgery \
    --method combine --coco \
    --src1 $CKPT/faster_rcnn_R_50_FPN_base/model_final.ckpt \
    --src2 $CKPT/faster_rcnn_R_50_FPN_ft_novel_30shot/model_final.ckpt \
    --save-dir $CKPT/faster_rcnn_R_50_FPN_ft_novel_30shot/

# 5. finetune on novel + balanced base data with aug/dropout
python -m tools.train_net \
    --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_ft_all_30shot_aug_ftmore_dropout.yaml

##### BOX CORRECTOR TRAINING

# 6-7. extract RPN proposals from the base and finetuned detectors
python -m tools.train_net \
    --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_base.yaml \
    --resume --eval-only \
    DATASETS.TEST "('coco_test_all', 'coco_trainval_all',)" \
    MODEL.META_ARCHITECTURE "ProposalNetwork"
python -m tools.train_net \
    --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_ft_all_30shot_aug_ftmore_dropout.yaml \
    --resume --eval-only \
    DATASETS.TEST "('coco_test_all', 'coco_trainval_all',)" \
    MODEL.META_ARCHITECTURE "ProposalNetwork"

# 8-9. train the cascade UBBR corrector (base then finetune)
python -m tools.train_net_reg \
    --config-file configs/COCO-detection/cascade_ubbr_R_50_FPN_base.yaml \
    DATASETS.PROPOSAL_FILES_TRAIN "('$CKPT/faster_rcnn_R_50_FPN_base/coco_proposals_trainval_results.pkl',)" \
    DATASETS.PROPOSAL_FILES_TEST "('$CKPT/faster_rcnn_R_50_FPN_base/coco_proposals_test_results.pkl',)"
python -m tools.train_net_reg \
    --config-file configs/COCO-detection/cascade_ubbr_R_50_FPN_ft_all_30shot_aug_ftmore.yaml \
    DATASETS.PROPOSAL_FILES_TRAIN "('$FT/coco_proposals_trainval_results.pkl',)" \
    DATASETS.PROPOSAL_FILES_TEST "('$FT/coco_proposals_test_results.pkl',)"

##### CANDIDATE SOURCING (LABEL)

# 10. extract detections on the training + unlabeled sets
python -m tools.train_net \
    --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_ft_all_30shot_aug_ftmore_dropout.yaml \
    --resume --eval-only \
    DATASETS.TEST "('coco_trainval_all', 'coco_unlabeled_all')"

# 11-13. mine score-band candidates
python -m tools.create_coco_dataset_from_dets_all \
    --json-data coco_trainval_all --gt-data coco_trainval_all_30shot \
    --full --K-min 0.8 --K-max 1.0 \
    --dt-path "$FT/inference/coco_instances_trainval_results.json"
python -m tools.create_coco_dataset_from_dets_all \
    --json-data coco_unlabeled_all --gt-data coco_trainval_all_30shot \
    --full --K-min 0.8 --K-max 1.0 \
    --dt-path "$FT/inference/coco_instances_unlabeled_results.json"
python -m tools.create_coco_dataset_from_dets_all \
    --json-data coco_unlabeled_all --gt-data coco_trainval_all_30shot \
    --full --K-min 0.8 --K-max 1.0 \
    --dt-path "$FT/inference/coco_instances_unlabeled_results.json" --all-cats

##### LABEL VERIFICATION (VERIFY)

# 14-15. kNN-verify candidates against the shots with DINO descriptors
for SPLIT in trainval unlabeled; do
python -m tools.run_nearest_neighbours \
    --config-file configs/LABEL-Verification/dino_label_verification.yaml \
    --eval-only \
    DATASETS.DT_PATH "('$FT/inference/coco_instances_${SPLIT}_results_score_max10_min08_full_all.json',)" \
    QUERY_EXPAND.NN_DSET "('coco_trainval_all_30shot',)" \
    QUERY_EXPAND.KNN 10 \
    OUTPUT_DIR "$FT"
done

##### BOX CORRECTION (CORRECT)

# 16. cascade-correct the verified candidate boxes
for SPLIT in trainval unlabeled; do
python -m tools.train_net_reg_qe \
    --config-file configs/COCO-detection/cascade_ubbr_R_50_FPN_ft_all_30shot_aug_ftmore.yaml \
    --resume --eval-only \
    DATASETS.DT_PATH "('$FT/inference/coco_instances_${SPLIT}_results_score_max10_min08_full_all_dino_vits8_10_cosine.json',)" \
    MODEL.META_ARCHITECTURE "GeneralizedRCNNRegOnly" \
    QUERY_EXPAND.ENABLED True \
    MODEL.LOAD_PROPOSALS False
done

# 17. dataset sundries: corrected boxes by id, ignores, base annotations
for SPLIT in trainval unlabeled; do
python -m tools.combine_ubbr_with_qe \
    --ubbr-data "$FT/inference/coco_instances_${SPLIT}_results_score_max10_min08_full_all_dino_vits8_10_cosine_ubbr.json" \
    --qe-data "$FT/inference/coco_instances_${SPLIT}_results_score_max10_min08_full_all_dino_vits8_10_cosine.json"
python -m tools.combine_pseudo_with_ignore \
    --ps-data "$FT/inference/coco_instances_${SPLIT}_results_score_max10_min08_full_all_dino_vits8_10_cosine_ubbr_id.json" \
    --ig-data "$FT/inference/coco_instances_${SPLIT}_results_score_max10_min08_full_all.json"
done
python -m tools.combine_qe_with_base \
    --ps-data "$FT/inference/coco_instances_trainval_results_score_max10_min08_full_all_dino_vits8_10_cosine_ubbr_id_ignore.json" \
    --bs-data "datasets/cocosplit/datasplit/trainvalno5k.json"
python -m tools.combine_qe_with_base \
    --ps-data "$FT/inference/coco_instances_unlabeled_results_score_max10_min08_full_all_dino_vits8_10_cosine_ubbr_id_ignore.json" \
    --bs-data "$FT/inference/coco_instances_unlabeled_results_score_max10_min08_full_all_allcats.json" \
    --base-ignore

##### END-TO-END RETRAIN ON PSEUDO-ANNOTATIONS

# 18. retrain with pseudo-annotations + ignore regions
python -m tools.train_net_qe_ig \
    --config-file configs/COCO-detection/faster_rcnn_R_50_FPN_ft_all_30shot_aug_ftmore_dropout.yaml \
    OUTPUT_DIR "$FT/end_to_end_pseudo_annotations" \
    MODEL.WEIGHTS "$FT/model_final.ckpt" \
    DATASETS.DT_PATH "('$FT/inference/coco_instances_trainval_results_score_max10_min08_full_all_dino_vits8_10_cosine_ubbr_id_ignore_wbase.json', '$FT/inference/coco_instances_unlabeled_results_score_max10_min08_full_all_dino_vits8_10_cosine_ubbr_id_ignore_wbase_base_ig.json')" \
    QUERY_EXPAND.ENABLED True \
    MODEL.BACKBONE.FREEZE False
