"""Export (StableHLO) + serialize/file_io/video_visualizer utils."""
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_export_roundtrip(tmp_path):
    """Export a small inference program, serialize, reload, execute."""
    import flax.linen as nn

    from lvc_tpu.export import export_model, load_exported, save_exported

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, *, train=False):
            x = batch["image"].mean(axis=(1, 2))
            return {"logits": nn.Dense(4, name="fc")(x)}

    model = Tiny()
    batch = {"image": jnp.ones((2, 8, 8, 3), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    exported = export_model(model, variables, batch)
    path = os.path.join(tmp_path, "tiny.stablehlo")
    save_exported(exported, path)
    loaded = load_exported(path)
    out = loaded.call(batch)
    want = model.apply(variables, batch)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(want["logits"]), rtol=1e-6
    )


def test_export_stablehlo_text():
    import flax.linen as nn

    from lvc_tpu.export import export_stablehlo_text

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, *, train=False):
            return nn.Dense(2, name="fc")(batch["image"].reshape(1, -1))

    model = Tiny()
    batch = {"image": jnp.ones((2, 2), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    text = export_stablehlo_text(model, variables, batch)
    assert "stablehlo" in text or "func.func" in text


def test_picklable_wrapper_lambda():
    from lvc_tpu.utils.serialize import PicklableWrapper

    f = PicklableWrapper(lambda x: x + 1)
    g = pickle.loads(pickle.dumps(f))
    assert g(1) == 2
    # no-op double wrap
    assert PicklableWrapper(f)._obj is f._obj


def test_path_manager_local_and_dispatch(tmp_path):
    from lvc_tpu.utils.file_io import PathManager, PathHandler

    p = os.path.join(tmp_path, "x.txt")
    with open(p, "w") as f:
        f.write("hi")
    assert PathManager.get_local_path(p) == p
    assert PathManager.isfile(p)
    with PathManager.open(p) as f:
        assert f.read() == "hi"

    class FakeScheme(PathHandler):
        def get_local_path(self, path):
            return p

    PathManager.register_handler(FakeScheme(), "fake://")
    assert PathManager.get_local_path("fake://whatever") == p


def test_video_visualizer_tracks_colors():
    from lvc_tpu.modeling.roi_heads.fast_rcnn import Detections
    from lvc_tpu.utils.video_visualizer import VideoVisualizer

    vv = VideoVisualizer()
    frame = np.zeros((64, 64, 3), np.uint8)

    def make_dets(offset):
        boxes = np.array([[10 + offset, 10, 30 + offset, 30], [40, 40, 60, 60]], np.float32)
        return Detections(
            boxes=boxes,
            scores=np.array([0.9, 0.8], np.float32),
            classes=np.array([0, 1], np.int32),
            valid=np.array([True, True]),
            proposal_idx=np.array([0, 1]),
        )

    vv.draw_instance_predictions(frame, make_dets(0))
    colors_frame1 = [t.color for t in vv._tracked]
    vv.draw_instance_predictions(frame, make_dets(2))  # small shift: same objects
    colors_frame2 = [t.color for t in vv._tracked]
    assert colors_frame1 == colors_frame2  # tracks kept their colors
    assert len(vv._tracked) == 2
