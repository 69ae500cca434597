"""Model construction from config.

Counterpart of lvc/modeling/meta_arch/build.py:3-17 (META_ARCH_REGISTRY +
build_model). Here build_model returns an (un-initialized) flax Module;
params come from module.init or a converted checkpoint.
"""
from __future__ import annotations

from lvc_tpu.modeling.backbone.fpn import build_resnet_fpn_backbone, fpn_strides
from lvc_tpu.modeling.backbone.resnet import build_resnet
from lvc_tpu.modeling.meta_arch.rcnn import GeneralizedRCNN, ProposalNetwork
from lvc_tpu.modeling.proposal_generator.rpn import RPN
from lvc_tpu.modeling.roi_heads.roi_heads import StandardROIHeads
from lvc_tpu.utils.registry import Registry

META_ARCH_REGISTRY = Registry("META_ARCH")


def build_backbone(cfg):
    name = cfg.MODEL.BACKBONE.NAME
    if name == "build_resnet_fpn_backbone":
        return build_resnet_fpn_backbone(cfg), fpn_strides(cfg.MODEL.FPN.IN_FEATURES)
    if name == "build_resnet_backbone":
        from lvc_tpu.modeling.backbone.resnet import RESNET_STAGE_STRIDES

        return build_resnet(cfg), dict(RESNET_STAGE_STRIDES)
    if name == "build_swin_transformer_fpn_backbone":
        from lvc_tpu.modeling.backbone.swin import build_swin_fpn_backbone

        return build_swin_fpn_backbone(cfg), fpn_strides(("res2", "res3", "res4", "res5"))
    raise ValueError(f"Unknown backbone: {name}")


def build_rpn(cfg, strides, ignore_regions: bool = False):
    return RPN(
        ignore_regions=ignore_regions,
        in_features=tuple(cfg.MODEL.RPN.IN_FEATURES),
        strides=strides,
        anchor_sizes=tuple(tuple(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES),
        anchor_aspect_ratios=tuple(tuple(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS),
        anchor_offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        iou_thresholds=tuple(cfg.MODEL.RPN.IOU_THRESHOLDS),
        iou_labels=tuple(cfg.MODEL.RPN.IOU_LABELS),
        batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
        bbox_reg_weights=tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
        smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
        loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
        pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
        pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
        post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        min_box_size=float(cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE),
        approx_topk=cfg.MODEL.RPN.APPROX_TOPK,
        name="proposal_generator",
    )


def build_roi_heads(cfg, strides):
    name = cfg.MODEL.ROI_HEADS.NAME
    common = _roi_heads_kwargs(cfg, strides)
    if name == "CascadeROIHeads":
        from lvc_tpu.modeling.roi_heads.cascade_rcnn import CascadeROIHeads

        return CascadeROIHeads(
            cascade_ious=tuple(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS),
            cascade_bbox_reg_weights=tuple(
                tuple(w) for w in cfg.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS
            )[: len(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS)],
            ubbr_lambda=cfg.MODEL.UBBR.LAMBDA,
            **common,
        )
    if name == "CascadeUBBRROIHeads":
        from lvc_tpu.modeling.roi_heads.cascade_rcnn import CascadeUBBRROIHeads

        return CascadeUBBRROIHeads(
            cascade_steps=cfg.MODEL.UBBR.CASCADE_STEPS,
            ubbr_lambda=cfg.MODEL.UBBR.LAMBDA,
            **common,
        )
    if name == "UBBRROIHeads":
        from lvc_tpu.modeling.roi_heads.cascade_rcnn import UBBRROIHeads

        return UBBRROIHeads(**common)
    if name == "Res5ROIHeads":
        from lvc_tpu.modeling.roi_heads.extra_heads import Res5ROIHeads

        return Res5ROIHeads(
            num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
            width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
            res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            resnet_norm=cfg.MODEL.RESNETS.NORM,
            **common,
        )
    if name == "StandardROIHeadsCascadeBBox":
        from lvc_tpu.modeling.roi_heads.extra_heads import StandardROIHeadsCascadeBBox

        return StandardROIHeadsCascadeBBox(**common)
    if name == "CascadeStandardROIHeads":
        from lvc_tpu.modeling.roi_heads.extra_heads import CascadeStandardROIHeads

        return CascadeStandardROIHeads(**common)
    if name == "ParallelStandardROIHeads":
        from lvc_tpu.modeling.roi_heads.extra_heads import ParallelStandardROIHeads

        base_kwargs = dict(common)
        base_kwargs.pop("name")
        base_kwargs["num_classes"] = len(cfg.DATASETS.SEEN_IDS)
        novel_kwargs = dict(base_kwargs, num_classes=len(cfg.DATASETS.UNSEEN_IDS))
        return ParallelStandardROIHeads(
            base_head=StandardROIHeads(name="base", **base_kwargs),
            novel_head=StandardROIHeads(name="novel", **novel_kwargs),
            seen_ids=tuple(cfg.DATASETS.SEEN_IDS),
            unseen_ids=tuple(cfg.DATASETS.UNSEEN_IDS),
            split_ids=tuple(cfg.DATASETS.SPLIT_IDS),
            name="roi_heads",
        )
    if name not in ("StandardROIHeads",):
        raise NotImplementedError(f"ROI heads '{name}' not yet built")
    return StandardROIHeads(**common)


def _roi_heads_kwargs(cfg, strides):
    return dict(
        in_features=tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES),
        strides=strides,
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        iou_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
        iou_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
        batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        pooler_max_grid=cfg.MODEL.ROI_BOX_HEAD.POOLER_MAX_GRID,
        num_conv=cfg.MODEL.ROI_BOX_HEAD.NUM_CONV,
        conv_dim=cfg.MODEL.ROI_BOX_HEAD.CONV_DIM,
        num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
        fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
        head_norm=cfg.MODEL.ROI_BOX_HEAD.NORM,
        dropout=cfg.MODEL.ROI_BOX_HEAD.DROPOUT,
        output_layer=cfg.MODEL.ROI_HEADS.OUTPUT_LAYER,
        cosine_scale=cfg.MODEL.ROI_HEADS.COSINE_SCALE,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        bbox_reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
        box_reg_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
        reg_off=cfg.MODEL.ROI_HEADS.REG_OFF,
        score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        debug=cfg.DEBUG,
        pooler_impl=cfg.MODEL.ROI_HEADS.POOLER_IMPL,
        mask_on=cfg.MODEL.MASK_ON,
        mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
        mask_conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
        mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        cls_agnostic_mask=cfg.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK,
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
        keypoint_num_conv=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CONV,
        keypoint_conv_dim=cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIM,
        keypoint_pooler_resolution=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
        name="roi_heads",
    )


def build_proposal_generator(cfg, strides):
    name = cfg.MODEL.PROPOSAL_GENERATOR.NAME
    if name == "RPN":
        return build_rpn(cfg, strides)
    if name == "RPN_Ignore":
        # reference-registered variant (lvc rpn.py:25); anchors on ignore
        # regions are excluded from the RPN loss
        return build_rpn(cfg, strides, ignore_regions=True)
    if name == "RBG":
        from lvc_tpu.modeling.proposal_generator.rbg import RBG

        return RBG(
            alpha=cfg.MODEL.RBG.ALPHA,
            beta=cfg.MODEL.RBG.BETA,
            t=cfg.MODEL.RBG.T,
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            name="proposal_generator",
        )
    if name == "PrecomputedProposals":
        return None
    raise ValueError(f"Unknown proposal generator: {name}")


@META_ARCH_REGISTRY.register(name="GeneralizedRCNN")
def _build_generalized_rcnn(cfg):
    backbone, strides = build_backbone(cfg)
    rpn = build_proposal_generator(cfg, strides)
    roi_heads = build_roi_heads(cfg, strides)
    return GeneralizedRCNN(
        backbone=backbone,
        proposal_generator=rpn,
        roi_heads=roi_heads,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


@META_ARCH_REGISTRY.register(name="GeneralizedRCNNRegOnly")
def _build_generalized_rcnn_reg_only(cfg):
    from lvc_tpu.modeling.meta_arch.rcnn import GeneralizedRCNNRegOnly

    backbone, strides = build_backbone(cfg)
    pg = build_proposal_generator(cfg, strides)
    roi_heads = build_roi_heads(cfg, strides)
    return GeneralizedRCNNRegOnly(
        backbone=backbone,
        proposal_generator=pg,
        roi_heads=roi_heads,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


@META_ARCH_REGISTRY.register(name="GeneralizedRCNN_Context")
def _build_generalized_rcnn_context(cfg):
    from lvc_tpu.modeling.meta_arch.rcnn import GeneralizedRCNN_Context

    backbone, strides = build_backbone(cfg)
    pg = build_proposal_generator(cfg, strides)
    roi_heads = build_roi_heads(cfg, strides)
    return GeneralizedRCNN_Context(
        backbone=backbone,
        proposal_generator=pg,
        roi_heads=roi_heads,
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        context_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        context_in_feature=cfg.MODEL.ROI_HEADS.IN_FEATURES[-1],
        images_only=cfg.MODEL.IMAGES_ONLY,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


@META_ARCH_REGISTRY.register(name="RPNComp")
def _build_rpn_comp(cfg):
    from lvc_tpu.modeling.meta_arch.rpn_comp import RPNComp

    backbone, _ = build_backbone(cfg)
    return RPNComp(
        backbone=backbone,
        pooler=cfg.MODEL.RPNCOMP.POOLER or "identity",
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


def _build_sem_seg_head(cfg, strides):
    from lvc_tpu.modeling.meta_arch.semantic_seg import SemSegFPNHead

    in_features = tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
    return SemSegFPNHead(
        in_features=in_features,
        strides={f: strides[f] for f in in_features},
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        convs_dim=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
        common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
        norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
        ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
        loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
        name="sem_seg_head",
    )


@META_ARCH_REGISTRY.register(name="SemanticSegmentor")
def _build_semantic_segmentor(cfg):
    from lvc_tpu.modeling.meta_arch.semantic_seg import SemanticSegmentor

    backbone, strides = build_backbone(cfg)
    return SemanticSegmentor(
        backbone=backbone,
        sem_seg_head=_build_sem_seg_head(cfg, strides),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


@META_ARCH_REGISTRY.register(name="PanopticFPN")
def _build_panoptic_fpn(cfg):
    from lvc_tpu.modeling.meta_arch.panoptic_fpn import PanopticFPN

    backbone, strides = build_backbone(cfg)
    return PanopticFPN(
        backbone=backbone,
        proposal_generator=build_rpn(cfg, strides),
        roi_heads=build_roi_heads(cfg, strides),
        sem_seg_head=_build_sem_seg_head(cfg, strides),
        instance_loss_weight=cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


@META_ARCH_REGISTRY.register(name="RetinaNet")
def _build_retinanet(cfg):
    from lvc_tpu.modeling.backbone.fpn import FPN
    from lvc_tpu.modeling.meta_arch.retinanet import RetinaNet

    bottom_up = build_resnet(cfg)
    backbone = FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES) or ("res3", "res4", "res5"),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        top_block="p6p7",  # d2 build_retinanet_resnet_fpn_backbone (fpn.py:224-245)
        name="backbone",
    )
    in_features = tuple(cfg.MODEL.RETINANET.IN_FEATURES)
    strides = {f: 2 ** int(f[1:]) for f in in_features}  # "p3" -> 8, ... "p7" -> 128
    sizes = [list(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES]
    if len(sizes) != len(in_features):
        # d2's RetinaNet yaml overrides SIZES with 3 scale octaves per level
        # (stride*4 * 2^{0,1/3,2/3}); derive the same when unset.
        sizes = [
            [strides[f] * 4 * 2 ** (o / 3.0) for o in range(3)] for f in in_features
        ]
    return RetinaNet(
        backbone=backbone,
        in_features=in_features,
        strides=strides,
        num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
        anchor_sizes=tuple(tuple(s) for s in sizes),
        anchor_aspect_ratios=tuple(
            tuple(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS
        ),
        anchor_offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
        prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
        iou_thresholds=tuple(cfg.MODEL.RETINANET.IOU_THRESHOLDS),
        iou_labels=tuple(cfg.MODEL.RETINANET.IOU_LABELS),
        focal_loss_alpha=cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA,
        focal_loss_gamma=cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA,
        smooth_l1_beta=cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA,
        bbox_reg_weights=tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS),
        score_thresh_test=cfg.MODEL.RETINANET.SCORE_THRESH_TEST,
        topk_candidates_test=cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST,
        nms_thresh_test=cfg.MODEL.RETINANET.NMS_THRESH_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


@META_ARCH_REGISTRY.register(name="ProposalNetwork")
def _build_proposal_network(cfg):
    backbone, strides = build_backbone(cfg)
    rpn = build_rpn(cfg, strides)
    return ProposalNetwork(
        backbone=backbone,
        proposal_generator=rpn,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )


def build_model(cfg):
    """cfg -> flax Module (lvc build.py:12-17 analogue)."""
    from lvc_tpu.modeling.layers import set_compute_dtype

    set_compute_dtype(cfg.MODEL.DTYPE)
    return META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)(cfg)
