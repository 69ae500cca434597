"""Mask/keypoint structures and the multi-host launch shim."""
import numpy as np


def test_polygons_to_bitmask_and_polygonmasks():
    from lvc_tpu.structures.masks import BitMasks, PolygonMasks, polygons_to_bitmask

    square = [np.array([2.0, 2.0, 8.0, 2.0, 8.0, 8.0, 2.0, 8.0])]
    m = polygons_to_bitmask(square, 12, 12)
    assert m.shape == (12, 12)
    assert m[5, 5] and not m[0, 0]

    pm = PolygonMasks([square, square])
    assert len(pm) == 2
    areas = pm.area()
    np.testing.assert_allclose(areas, [36.0, 36.0])
    boxes = pm.get_bounding_boxes()
    np.testing.assert_allclose(boxes[0], [2, 2, 8, 8])

    bm = pm.to_bitmasks(12, 12)
    assert isinstance(bm, BitMasks) and len(bm) == 2
    assert bm.nonempty().all()
    padded, valid = bm.pad_to(5)
    assert padded.shape == (5, 12, 12)
    assert valid.tolist() == [True, True, False, False, False]
    bb = bm.get_bounding_boxes()
    assert bb[0][0] <= 2 and bb[0][2] >= 8


def test_keypoints_structure_and_flip():
    from lvc_tpu.structures.keypoints import (
        Keypoints,
        create_keypoint_hflip_indices,
        flip_keypoints,
    )

    kp = Keypoints(np.array([[[10.0, 5.0, 1], [20.0, 6.0, 2]]]))
    assert len(kp) == 1
    padded, valid = kp.pad_to(3)
    assert padded.shape == (3, 2, 3) and valid.tolist() == [True, False, False]

    idx = create_keypoint_hflip_indices(("nose", "left_eye", "right_eye"))
    assert idx == [0, 2, 1]
    flipped = flip_keypoints(np.array([[[10.0, 5.0, 1], [20.0, 6.0, 2], [30.0, 7.0, 1]]]), 100, idx)
    # left/right swapped and x mirrored
    np.testing.assert_allclose(flipped[0, 1], [70.0, 7.0, 1])
    np.testing.assert_allclose(flipped[0, 2], [80.0, 6.0, 2])


def test_launch_single_machine():
    from lvc_tpu.engine.launch import get_rank, get_world_size, is_main_process, launch

    result = launch(lambda a, b: a + b, num_machines=1, args=(2, 3))
    assert result == 5
    assert get_rank() == 0 and get_world_size() >= 1 and is_main_process()


def test_stem_space_to_depth_matches_plain():
    import jax
    import jax.numpy as jnp

    from lvc_tpu.modeling.backbone.resnet import BasicStem

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
    plain = BasicStem(space_to_depth=False)
    s2d = BasicStem(space_to_depth=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, x)),
        np.asarray(s2d.apply(variables, x)),
        atol=1e-5,
    )
    # odd input size falls back to the plain conv path
    x_odd = jnp.asarray(rng.rand(1, 31, 48, 3).astype(np.float32))
    out = s2d.apply(s2d.init(jax.random.PRNGKey(0), x_odd), x_odd)
    assert out.shape[1] == 8
