"""Load actual reference modules (from /root/reference) as parity oracles.

The reference's pure-torch modules (matcher, sampling, anchor generation,
RPN proposal selection, fast-rcnn inference/losses, box regression,
structures) import only: torch, torchvision (nms/box_iou), fvcore
(smooth_l1/giou/Registry), and detectron2-internal names. torchvision and
fvcore are not in this image, so minimal stand-ins with their public,
documented semantics are installed in sys.modules first; everything being
*tested* then executes the reference's own code.

Stub fidelity notes:
- ``torchvision.ops.nms``: greedy score-descending suppression with
  strictly-greater-than-threshold IoU, coordinates as-is (no +1) — the
  torchvision >= 0.5 convention the reference targets. Stable sort, so
  score ties keep index order (relevant tests use distinct scores).
- ``torchvision.ops.boxes.batched_nms``: the max-coordinate class-offset
  trick, verbatim semantics of torchvision/ops/boxes.py.
- ``fvcore.nn.smooth_l1_loss`` / ``giou_loss``: fvcore's documented
  formulas (beta<1e-5 => pure L1; giou with eps=1e-7 enclosing-box term).
"""
from __future__ import annotations

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# stand-ins for absent third-party deps
# --------------------------------------------------------------------------


def _install_torchvision():
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def box_iou(boxes1, boxes2):
        area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
        area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
        lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        union = area1[:, None] + area2[None, :] - inter
        return torch.where(union > 0, inter / union, torch.zeros_like(inter))

    def nms(boxes, scores, iou_threshold):
        n = boxes.shape[0]
        if n == 0:
            return torch.empty((0,), dtype=torch.int64)
        order = torch.argsort(scores, descending=True, stable=True)
        iou = box_iou(boxes, boxes)
        suppressed = torch.zeros(n, dtype=torch.bool)
        keep = []
        for oi in order.tolist():
            if suppressed[oi]:
                continue
            keep.append(oi)
            suppressed |= iou[oi] > iou_threshold
        return torch.as_tensor(keep, dtype=torch.int64)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64, device=boxes.device)
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
        boxes_for_nms = boxes + offsets[:, None]
        return nms(boxes_for_nms, scores, iou_threshold)

    boxes_mod.batched_nms = batched_nms
    boxes_mod.nms = nms
    boxes_mod.box_iou = box_iou
    ops.boxes = boxes_mod
    ops.nms = nms
    ops.batched_nms = batched_nms
    ops.box_iou = box_iou
    tv.ops = ops
    tv.__version__ = "0.7.0-stub"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod


def _install_fvcore():
    import torch

    fv = types.ModuleType("fvcore")
    fv_nn = types.ModuleType("fvcore.nn")
    fv_common = types.ModuleType("fvcore.common")
    fv_reg = types.ModuleType("fvcore.common.registry")

    def smooth_l1_loss(input, target, beta, reduction="none"):
        if beta < 1e-5:
            loss = torch.abs(input - target)
        else:
            n = torch.abs(input - target)
            cond = n < beta
            loss = torch.where(cond, 0.5 * n ** 2 / beta, n - 0.5 * beta)
        if reduction == "mean":
            loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    def giou_loss(boxes1, boxes2, reduction="none", eps=1e-7):
        x1, y1, x2, y2 = boxes1.unbind(dim=-1)
        x1g, y1g, x2g, y2g = boxes2.unbind(dim=-1)
        xkis1 = torch.max(x1, x1g)
        ykis1 = torch.max(y1, y1g)
        xkis2 = torch.min(x2, x2g)
        ykis2 = torch.min(y2, y2g)
        intsctk = torch.zeros_like(x1)
        mask = (ykis2 > ykis1) & (xkis2 > xkis1)
        intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
        unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
        iouk = intsctk / (unionk + eps)
        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        area_c = (xc2 - xc1) * (yc2 - yc1)
        miouk = iouk - ((area_c - unionk) / (area_c + eps))
        loss = 1 - miouk
        if reduction == "mean":
            loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    class Registry:
        def __init__(self, name):
            self._name = name
            self._obj_map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._obj_map[cls.__name__] = cls
                    return cls
                return deco
            self._obj_map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._obj_map[name]

    fv_nn.smooth_l1_loss = smooth_l1_loss
    fv_nn.giou_loss = giou_loss
    fv_reg.Registry = Registry
    fv_common.registry = fv_reg
    fv.nn = fv_nn
    fv.common = fv_common
    sys.modules["fvcore"] = fv
    sys.modules["fvcore.nn"] = fv_nn
    sys.modules["fvcore.common"] = fv_common
    sys.modules["fvcore.common.registry"] = fv_reg


# --------------------------------------------------------------------------
# reference module assembly
# --------------------------------------------------------------------------


def _pkg(name):
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package
    sys.modules[name] = mod
    return mod


def _load_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    # attach to parent so `import a.b` style access works too
    parent, _, leaf = name.rpartition(".")
    if parent in sys.modules:
        setattr(sys.modules[parent], leaf, mod)
    return mod


_CACHE = None


def load_reference():
    """Assemble the reference's pure-torch modules; returns a namespace.

    Idempotent (modules cached after first call).
    """
    global _CACHE
    if _CACHE is not None:
        return _CACHE

    if "torchvision" not in sys.modules or not hasattr(
        sys.modules.get("torchvision", None), "__version__"
    ):
        _install_torchvision()
    if "fvcore" not in sys.modules:
        _install_fvcore()

    d2 = _pkg("detectron2")
    _pkg("detectron2.utils")
    _pkg("detectron2.layers")
    _pkg("detectron2.structures")
    _pkg("detectron2.modeling")
    _pkg("detectron2.modeling.proposal_generator")
    _pkg("lvc")
    _pkg("lvc.modeling")
    _pkg("lvc.modeling.roi_heads")

    R = REF_ROOT
    env = _load_file("detectron2.utils.env", f"{R}/detectron2/utils/env.py")
    registry = _load_file("detectron2.utils.registry", f"{R}/detectron2/utils/registry.py")

    # events: minimal EventStorage stand-in (metrics logging side channel)
    events = types.ModuleType("detectron2.utils.events")

    class _DummyStorage:
        iter = 0

        def put_scalar(self, *a, **k):
            pass

    _storage = _DummyStorage()
    events.get_event_storage = lambda: _storage
    sys.modules["detectron2.utils.events"] = events
    sys.modules["detectron2.utils"].events = events

    shape_spec = _load_file("detectron2.layers.shape_spec", f"{R}/detectron2/layers/shape_spec.py")
    wrappers = _load_file("detectron2.layers.wrappers", f"{R}/detectron2/layers/wrappers.py")
    nms_mod = _load_file("detectron2.layers.nms", f"{R}/detectron2/layers/nms.py")

    layers = sys.modules["detectron2.layers"]
    for src in (shape_spec, wrappers, nms_mod):
        for k in dir(src):
            if not k.startswith("_"):
                setattr(layers, k, getattr(src, k))

    # rotated pairwise IoU needs the compiled _C op; tests don't use it
    rb_layers = types.ModuleType("detectron2.layers.rotated_boxes")

    def _no_c(*a, **k):
        raise RuntimeError("detectron2._C not built in the parity harness")

    rb_layers.pairwise_iou_rotated = _no_c
    sys.modules["detectron2.layers.rotated_boxes"] = rb_layers

    boxes = _load_file("detectron2.structures.boxes", f"{R}/detectron2/structures/boxes.py")
    instances = _load_file("detectron2.structures.instances", f"{R}/detectron2/structures/instances.py")
    image_list = _load_file("detectron2.structures.image_list", f"{R}/detectron2/structures/image_list.py")
    rotated_boxes = _load_file(
        "detectron2.structures.rotated_boxes", f"{R}/detectron2/structures/rotated_boxes.py"
    )
    structures = sys.modules["detectron2.structures"]
    structures.Boxes = boxes.Boxes
    structures.BoxMode = boxes.BoxMode
    structures.pairwise_iou = boxes.pairwise_iou
    structures.Instances = instances.Instances
    structures.ImageList = image_list.ImageList
    structures.RotatedBoxes = rotated_boxes.RotatedBoxes

    # config: the REAL reference config stack (d2 config.py + defaults.py,
    # lvc config.py + defaults.py). fvcore's CfgNode base is backed by our
    # own yacs-style CfgNode via a thin shim, so the reference's
    # `configurable` decorator and default tree behave exactly as shipped.
    fv_config = types.ModuleType("fvcore.common.config")

    from lvc_tpu.config.config import CfgNode as _OurCfgNode
    from lvc_tpu.config.config import _load_yaml_with_base

    class FvCfgNode(_OurCfgNode):
        @classmethod
        def load_yaml_with_base(cls, filename, allow_unsafe=False):
            return _load_yaml_with_base(filename)

    fv_config.CfgNode = FvCfgNode
    sys.modules["fvcore.common.config"] = fv_config
    sys.modules["fvcore.common"].config = fv_config

    # file_io: PathManager used only for opening local config files
    file_io = types.ModuleType("detectron2.utils.file_io")

    class _PathManager:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def isfile(path):
            import os

            return os.path.isfile(path)

        @staticmethod
        def get_local_path(path, **kw):
            return path

    file_io.PathManager = _PathManager
    sys.modules["detectron2.utils.file_io"] = file_io
    sys.modules["detectron2.utils"].file_io = file_io

    config = _pkg("detectron2.config")
    d2_config_mod = _load_file("detectron2.config.config", f"{R}/detectron2/config/config.py")
    for k in ("CfgNode", "get_cfg", "global_cfg", "set_global_cfg", "configurable"):
        setattr(config, k, getattr(d2_config_mod, k))
    d2.config = config
    _load_file("detectron2.config.defaults", f"{R}/detectron2/config/defaults.py")

    lvc_config = _pkg("lvc.config")
    lvc_config_mod = _load_file("lvc.config.config", f"{R}/lvc/config/config.py")
    for k in ("CfgNode", "get_cfg", "global_cfg", "set_global_cfg"):
        setattr(lvc_config, k, getattr(lvc_config_mod, k))
    sys.modules["lvc"].config = lvc_config
    _load_file("lvc.config.defaults", f"{R}/lvc/config/defaults.py")

    # memory helpers: pure-CPU runs never hit the CUDA-OOM retry path
    memory = types.ModuleType("detectron2.utils.memory")
    memory.retry_if_cuda_oom = lambda f: f
    sys.modules["detectron2.utils.memory"] = memory
    sys.modules["detectron2.utils"].memory = memory

    box_regression = _load_file(
        "detectron2.modeling.box_regression", f"{R}/detectron2/modeling/box_regression.py"
    )
    matcher = _load_file("detectron2.modeling.matcher", f"{R}/detectron2/modeling/matcher.py")
    sampling = _load_file("detectron2.modeling.sampling", f"{R}/detectron2/modeling/sampling.py")
    lvc_sampling = _load_file("lvc.modeling.sampling", f"{R}/lvc/modeling/sampling.py")
    anchor_generator = _load_file(
        "detectron2.modeling.anchor_generator", f"{R}/detectron2/modeling/anchor_generator.py"
    )
    modeling = sys.modules["detectron2.modeling"]
    modeling.box_regression = box_regression
    proposal_utils = _load_file(
        "detectron2.modeling.proposal_generator.proposal_utils",
        f"{R}/detectron2/modeling/proposal_generator/proposal_utils.py",
    )
    pg_build = types.ModuleType("detectron2.modeling.proposal_generator.build")
    pg_build.PROPOSAL_GENERATOR_REGISTRY = registry.Registry("PROPOSAL_GENERATOR")
    sys.modules["detectron2.modeling.proposal_generator.build"] = pg_build
    sys.modules["detectron2.modeling.proposal_generator"].build = pg_build
    rpn = _load_file(
        "detectron2.modeling.proposal_generator.rpn",
        f"{R}/detectron2/modeling/proposal_generator/rpn.py",
    )
    fast_rcnn = _load_file(
        "lvc.modeling.roi_heads.fast_rcnn", f"{R}/lvc/modeling/roi_heads/fast_rcnn.py"
    )
    mask_ops = _load_file("detectron2.layers.mask_ops", f"{R}/detectron2/layers/mask_ops.py")
    keypoints = _load_file(
        "detectron2.structures.keypoints", f"{R}/detectron2/structures/keypoints.py"
    )

    _CACHE = types.SimpleNamespace(
        env=env,
        registry=registry,
        layers=layers,
        boxes=boxes,
        instances=instances,
        image_list=image_list,
        box_regression=box_regression,
        matcher=matcher,
        sampling=sampling,
        lvc_sampling=lvc_sampling,
        anchor_generator=anchor_generator,
        proposal_utils=proposal_utils,
        rpn=rpn,
        fast_rcnn=fast_rcnn,
        nms=nms_mod,
        mask_ops=mask_ops,
        keypoints=keypoints,
    )
    return _CACHE


_MODEL_CACHE = None


def load_reference_model_modules():
    """Extend load_reference() with the full reference model stack:
    ResNet+FPN backbone, RPN, LVC ROI heads, GeneralizedRCNN — enough to
    build and run the reference detector on CPU. The RoIAlign op inside
    torchvision's slot is backed by the COMPILED reference ROIAlign_cpu.cpp
    (layers/roi_align.py routes to torchvision >= 0.7).
    Returns a namespace with ``meta_arch`` (lvc rcnn module) and helpers.
    """
    global _MODEL_CACHE
    if _MODEL_CACHE is not None:
        return _MODEL_CACHE
    base = load_reference()
    import torch

    R = REF_ROOT

    # -- torchvision additions: real roi_align semantics via the compiled ext
    ext = compiled_reference_roi_align()
    tv_ops = sys.modules["torchvision.ops"]

    def tv_roi_align(input, boxes, output_size, spatial_scale=1.0, sampling_ratio=-1, aligned=False):
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        return ext.forward(
            input, boxes, spatial_scale, output_size[0], output_size[1],
            sampling_ratio, aligned,
        )

    class RoIPool(torch.nn.Module):  # ROIPooler type "ROIPool" — unused here
        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("RoIPool not supported in parity harness")

    tv_ops.roi_align = tv_roi_align
    tv_ops.RoIPool = RoIPool

    # -- fvcore weight init (caffe2 conventions, fvcore/nn/weight_init.py)
    wi = types.ModuleType("fvcore.nn.weight_init")

    def c2_msra_fill(module):
        torch.nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            torch.nn.init.constant_(module.bias, 0)

    def c2_xavier_fill(module):
        torch.nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            torch.nn.init.constant_(module.bias, 0)

    wi.c2_msra_fill = c2_msra_fill
    wi.c2_xavier_fill = c2_xavier_fill
    sys.modules["fvcore.nn.weight_init"] = wi
    sys.modules["fvcore.nn"].weight_init = wi

    # -- logging shims (log_first_n etc. — side-channel only)
    logger_mod = types.ModuleType("detectron2.utils.logger")
    logger_mod.log_first_n = lambda *a, **k: None
    logger_mod.log_every_n = lambda *a, **k: None
    logger_mod.log_every_n_seconds = lambda *a, **k: None
    logger_mod.setup_logger = lambda *a, **k: None
    sys.modules["detectron2.utils.logger"] = logger_mod
    sys.modules["detectron2.utils"].logger = logger_mod

    comm = _load_file("detectron2.utils.comm", f"{R}/detectron2/utils/comm.py")

    # -- layers: batch norm, blocks, real ROIAlign wrapper, mask ops
    layers = sys.modules["detectron2.layers"]
    batch_norm = _load_file("detectron2.layers.batch_norm", f"{R}/detectron2/layers/batch_norm.py")
    blocks = _load_file("detectron2.layers.blocks", f"{R}/detectron2/layers/blocks.py")
    roi_align_mod = _load_file("detectron2.layers.roi_align", f"{R}/detectron2/layers/roi_align.py")
    mask_ops = _load_file("detectron2.layers.mask_ops", f"{R}/detectron2/layers/mask_ops.py")
    for src in (batch_norm, blocks, roi_align_mod, mask_ops):
        for k in dir(src):
            if not k.startswith("_"):
                setattr(layers, k, getattr(src, k))

    class ROIAlignRotated(torch.nn.Module):  # needs _C; unused in parity runs
        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("ROIAlignRotated not supported in parity harness")

    layers.ROIAlignRotated = ROIAlignRotated

    class _NeedsC(torch.nn.Module):  # deform conv needs _C; configs keep it off
        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("deformable conv not supported in parity harness")

    layers.DeformConv = type("DeformConv", (_NeedsC,), {})
    layers.ModulatedDeformConv = type("ModulatedDeformConv", (_NeedsC,), {})

    keypoints = _load_file(
        "detectron2.structures.keypoints", f"{R}/detectron2/structures/keypoints.py"
    )
    structures = sys.modules["detectron2.structures"]
    structures.Keypoints = keypoints.Keypoints
    structures.heatmaps_to_keypoints = keypoints.heatmaps_to_keypoints

    # -- backbone stack
    _pkg("detectron2.modeling.backbone")
    bb_backbone = _load_file(
        "detectron2.modeling.backbone.backbone", f"{R}/detectron2/modeling/backbone/backbone.py"
    )
    bb_build = _load_file(
        "detectron2.modeling.backbone.build", f"{R}/detectron2/modeling/backbone/build.py"
    )
    bb_resnet = _load_file(
        "detectron2.modeling.backbone.resnet", f"{R}/detectron2/modeling/backbone/resnet.py"
    )
    bb_fpn = _load_file(
        "detectron2.modeling.backbone.fpn", f"{R}/detectron2/modeling/backbone/fpn.py"
    )
    bb_pkg = sys.modules["detectron2.modeling.backbone"]
    bb_pkg.Backbone = bb_backbone.Backbone
    bb_pkg.build_backbone = bb_build.build_backbone
    bb_pkg.BACKBONE_REGISTRY = bb_build.BACKBONE_REGISTRY

    poolers = _load_file("detectron2.modeling.poolers", f"{R}/detectron2/modeling/poolers.py")
    postprocessing = _load_file(
        "detectron2.modeling.postprocessing", f"{R}/detectron2/modeling/postprocessing.py"
    )
    modeling = sys.modules["detectron2.modeling"]
    modeling.poolers = poolers
    modeling.postprocessing = postprocessing

    # -- proposal generator build glue (mirrors build.py:1-24 minus rrpn)
    pg = sys.modules["detectron2.modeling.proposal_generator"]
    pg_build = sys.modules["detectron2.modeling.proposal_generator.build"]

    def build_proposal_generator(cfg, input_shape):
        name = cfg.MODEL.PROPOSAL_GENERATOR.NAME
        if name == "PrecomputedProposals":
            return None
        return pg_build.PROPOSAL_GENERATOR_REGISTRY.get(name)(cfg, input_shape)

    pg_build.build_proposal_generator = build_proposal_generator
    pg.build_proposal_generator = build_proposal_generator
    pg.PROPOSAL_GENERATOR_REGISTRY = pg_build.PROPOSAL_GENERATOR_REGISTRY
    modeling.PROPOSAL_GENERATOR_REGISTRY = pg_build.PROPOSAL_GENERATOR_REGISTRY

    # -- d2 roi_heads (lvc's cascade imports StandardROIHeads from it)
    _pkg("detectron2.modeling.roi_heads")
    d2rh_box_head = _load_file(
        "detectron2.modeling.roi_heads.box_head", f"{R}/detectron2/modeling/roi_heads/box_head.py"
    )
    d2rh_mask = _load_file(
        "detectron2.modeling.roi_heads.mask_head", f"{R}/detectron2/modeling/roi_heads/mask_head.py"
    )
    d2rh_kpt = _load_file(
        "detectron2.modeling.roi_heads.keypoint_head",
        f"{R}/detectron2/modeling/roi_heads/keypoint_head.py",
    )
    d2rh_fast = _load_file(
        "detectron2.modeling.roi_heads.fast_rcnn", f"{R}/detectron2/modeling/roi_heads/fast_rcnn.py"
    )
    d2rh = _load_file(
        "detectron2.modeling.roi_heads.roi_heads", f"{R}/detectron2/modeling/roi_heads/roi_heads.py"
    )
    d2rh_pkg = sys.modules["detectron2.modeling.roi_heads"]
    for k in ("ROI_HEADS_REGISTRY", "ROIHeads", "Res5ROIHeads", "StandardROIHeads", "build_roi_heads"):
        setattr(d2rh_pkg, k, getattr(d2rh, k))
    d2rh_pkg.build_box_head = d2rh_box_head.build_box_head
    d2rh_pkg.build_mask_head = d2rh_mask.build_mask_head
    d2rh_pkg.build_keypoint_head = d2rh_kpt.build_keypoint_head

    # -- lvc roi_heads hierarchy + meta arch
    lvc_box_head = _load_file(
        "lvc.modeling.roi_heads.box_head", f"{R}/lvc/modeling/roi_heads/box_head.py"
    )
    lvc_fast_debug = _load_file(
        "lvc.modeling.roi_heads.fast_rcnn_debug", f"{R}/lvc/modeling/roi_heads/fast_rcnn_debug.py"
    )
    lvc_rh = _load_file(
        "lvc.modeling.roi_heads.roi_heads", f"{R}/lvc/modeling/roi_heads/roi_heads.py"
    )
    lvc_rh_cascade = _load_file(
        "lvc.modeling.roi_heads.roi_heads_cascade",
        f"{R}/lvc/modeling/roi_heads/roi_heads_cascade.py",
    )
    lvc_cascade = _load_file(
        "lvc.modeling.roi_heads.cascade_rcnn", f"{R}/lvc/modeling/roi_heads/cascade_rcnn.py"
    )
    lvc_rh_pkg = sys.modules["lvc.modeling.roi_heads"]
    lvc_rh_pkg.build_roi_heads = lvc_rh.build_roi_heads
    lvc_rh_pkg.ROI_HEADS_REGISTRY = lvc_rh.ROI_HEADS_REGISTRY
    lvc_rh_pkg.StandardROIHeads = lvc_rh.StandardROIHeads
    lvc_rh_pkg.build_box_head = lvc_box_head.build_box_head

    _pkg("lvc.modeling.proposal_generator")
    lvc_rbg = _load_file(
        "lvc.modeling.proposal_generator.rbg", f"{R}/lvc/modeling/proposal_generator/rbg.py"
    )
    _pkg("lvc.modeling.meta_arch")
    lvc_ma_build = _load_file(
        "lvc.modeling.meta_arch.build", f"{R}/lvc/modeling/meta_arch/build.py"
    )
    lvc_rcnn = _load_file(
        "lvc.modeling.meta_arch.rcnn", f"{R}/lvc/modeling/meta_arch/rcnn.py"
    )

    _MODEL_CACHE = types.SimpleNamespace(
        base=base,
        comm=comm,
        batch_norm=batch_norm,
        resnet=bb_resnet,
        fpn=bb_fpn,
        poolers=poolers,
        postprocessing=postprocessing,
        d2_roi_heads=d2rh,
        lvc_roi_heads=lvc_rh,
        cascade=lvc_cascade,
        rbg=lvc_rbg,
        meta_arch=lvc_rcnn,
        build_model=lambda cfg: lvc_ma_build.META_ARCH_REGISTRY.get(
            cfg.MODEL.META_ARCHITECTURE
        )(cfg),
        get_cfg=sys.modules["lvc.config"].get_cfg,
        set_global_cfg=sys.modules["lvc.config"].set_global_cfg,
    )
    return _MODEL_CACHE


# --------------------------------------------------------------------------
# compiled reference RoIAlign (the actual ROIAlign_cpu.cpp)
# --------------------------------------------------------------------------

_ROI_EXT = None


def compiled_reference_roi_align():
    """Build the reference's ROIAlign_cpu.cpp with torch.utils.cpp_extension
    and return the module (functions: forward(input, rois, spatial_scale,
    ph, pw, sampling_ratio, aligned) and backward(...)).
    """
    global _ROI_EXT
    if _ROI_EXT is not None:
        return _ROI_EXT
    import os

    from torch.utils import cpp_extension

    src_dir = f"{REF_ROOT}/detectron2/layers/csrc/ROIAlign"
    binding = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc", "ref_roialign_ext.cpp")
    build_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "lvc_tpu", "torch_ext", "ref_roialign",
    )
    os.makedirs(build_dir, exist_ok=True)
    _ROI_EXT = cpp_extension.load(
        name="ref_roialign",
        sources=[binding, os.path.join(src_dir, "ROIAlign_cpu.cpp")],
        extra_include_paths=[src_dir],
        build_directory=build_dir,
        verbose=False,
    )
    return _ROI_EXT


_NMSROT_EXT = None


def compiled_reference_nms_rotated():
    """Build the reference's nms_rotated_cpu.cpp + box_iou_rotated_cpu.cpp.

    With angle == 0 these double as exact oracles for axis-aligned NMS
    suppression semantics and pairwise IoU.
    """
    global _NMSROT_EXT
    if _NMSROT_EXT is not None:
        return _NMSROT_EXT
    import os

    from torch.utils import cpp_extension

    csrc = f"{REF_ROOT}/detectron2/layers/csrc"
    binding = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "csrc", "ref_nms_rotated_ext.cpp"
    )
    build_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "lvc_tpu", "torch_ext", "ref_nms_rotated",
    )
    os.makedirs(build_dir, exist_ok=True)
    _NMSROT_EXT = cpp_extension.load(
        name="ref_nms_rotated",
        sources=[
            binding,
            os.path.join(csrc, "nms_rotated", "nms_rotated_cpu.cpp"),
            os.path.join(csrc, "box_iou_rotated", "box_iou_rotated_cpu.cpp"),
        ],
        extra_include_paths=[
            os.path.join(csrc, "nms_rotated"),
            os.path.join(csrc, "box_iou_rotated"),
        ],
        build_directory=build_dir,
        verbose=False,
    )
    return _NMSROT_EXT


_COCOEVAL_EXT = None


def compiled_reference_cocoeval():
    """Build the reference's cocoeval.cpp (the C++ EvaluateImages +
    Accumulate behind detectron2/evaluation/fast_eval_api.py) and return
    the module. This is the oracle for our COCOeval match/accumulate
    semantics (VERDICT r2 next #2)."""
    global _COCOEVAL_EXT
    if _COCOEVAL_EXT is not None:
        return _COCOEVAL_EXT
    import os

    from torch.utils import cpp_extension

    src_dir = f"{REF_ROOT}/detectron2/layers/csrc/cocoeval"
    binding = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "csrc", "ref_cocoeval_ext.cpp"
    )
    build_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "lvc_tpu", "torch_ext", "ref_cocoeval",
    )
    os.makedirs(build_dir, exist_ok=True)
    _COCOEVAL_EXT = cpp_extension.load(
        name="ref_cocoeval",
        sources=[binding, os.path.join(src_dir, "cocoeval.cpp")],
        extra_include_paths=[src_dir],
        build_directory=build_dir,
        verbose=False,
    )
    return _COCOEVAL_EXT
