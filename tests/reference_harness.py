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

    # config: passthrough `configurable` + dummy global_cfg; reference
    # modules under test are instantiated with explicit kwargs only
    config = types.ModuleType("detectron2.config")

    def configurable(init_func=None, *, from_config=None):
        if init_func is not None:
            return init_func
        return lambda f: f

    config.configurable = configurable
    sys.modules["detectron2.config"] = config
    d2.config = config

    lvc_config = types.ModuleType("lvc.config")
    lvc_config.global_cfg = types.SimpleNamespace()
    sys.modules["lvc.config"] = lvc_config
    sys.modules["lvc"].config = lvc_config

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
    )
    return _CACHE


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
