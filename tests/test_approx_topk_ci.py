"""CI coverage for the APPROX_TOPK serving branch (VERDICT r4 next #4).

`bench.py` enables `MODEL.RPN.APPROX_TOPK` for serving (quantified on
chip: 97.9% bitwise-identical detections, PARITY.md), but the
`jax.lax.approx_max_k` branch (rpn.py per-level pre-NMS selection) was
in zero tests — CPU CI always took the exact `top_k` arm because the
default is off. This compiles and runs the approx branch end-to-end on
CPU, where `approx_max_k` lowers to an exact selection, so the full
detection outputs must MATCH the exact path bit-for-bit — any shape,
wiring, or ordering regression in the branch turns this red.

Reference anchor: per-level pre-NMS top-k in
/root/reference/detectron2/modeling/proposal_generator/proposal_utils.py:57-77.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _small_model(approx):
    from lvc_tpu.config import get_cfg
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.APPROX_TOPK = approx
    cfg.PAD.CANVAS_BUCKETS = [[128, 128]]
    return build_model(cfg)


def test_approx_topk_branch_compiles_and_matches_exact_on_cpu():
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
            * 255
        ),
        "image_size": jnp.asarray([[128, 128]], np.int32),
    }
    outs = {}
    for approx in (False, True):
        model = _small_model(approx)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
        dets = jax.jit(lambda v, b: model.apply(v, b, train=False))(
            variables, batch
        )
        outs[approx] = dets
    exact, approx = outs[False], outs[True]
    assert exact.boxes.shape == approx.boxes.shape
    assert exact.scores.shape == approx.scores.shape
    # CPU lowers approx_max_k to an exact selection: identical detections
    np.testing.assert_array_equal(np.asarray(exact.valid), np.asarray(approx.valid))
    np.testing.assert_allclose(
        np.asarray(exact.boxes), np.asarray(approx.boxes), atol=0.0
    )
    np.testing.assert_allclose(
        np.asarray(exact.scores), np.asarray(approx.scores), atol=0.0
    )
