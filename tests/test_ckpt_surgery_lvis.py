"""LVIS checkpoint surgery: row mapping parity with the reference tool.

The reference's LVIS branch (tools/ckpt_surgery.py:59-77,231-275) differs
from COCO: the base detector already holds all-class rows, so base rows are
sourced by class id `c` (not enumeration index), and novel rows come from
the novel checkpoint by enumeration index through IDMAP.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FEAT = 16
N_ALL = 1230


def _save(tmp_path, name, n_cls, seed):
    rng = np.random.RandomState(seed)
    sd = {
        "roi_heads.box_predictor.cls_score.weight": rng.randn(n_cls + 1, FEAT).astype(np.float32),
        "roi_heads.box_predictor.cls_score.bias": rng.randn(n_cls + 1).astype(np.float32),
        "roi_heads.box_predictor.bbox_pred.weight": rng.randn(n_cls * 4, FEAT).astype(np.float32),
        "roi_heads.box_predictor.bbox_pred.bias": rng.randn(n_cls * 4).astype(np.float32),
    }
    path = str(tmp_path / name)
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)
    return sd, path


def _run(args, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/ckpt_surgery.py"),
         "--save-dir", str(tmp_path), "--lvis", *args],
        check=True, env=env,
    )


def test_lvis_randinit_sources_base_rows_by_class_id(tmp_path):
    from lvc_tpu.data.builtin_meta import LVIS_NOVEL_IDS

    novel = set(LVIS_NOVEL_IDS)
    base = [c for c in range(N_ALL) if c not in novel]
    # LVIS idmap is the identity (base+novel cover 0..1229 contiguously)
    sd, base_pth = _save(tmp_path, "base.pth", N_ALL, seed=0)
    _run(["--src1", base_pth, "--method", "randinit"], tmp_path)
    out = torch.load(str(tmp_path / "model_reset_surgery.pth"), weights_only=False)["model"]
    W = out["roi_heads.box_predictor.cls_score.weight"].numpy()
    W0 = sd["roi_heads.box_predictor.cls_score.weight"]
    assert W.shape == (N_ALL + 1, FEAT)
    # base rows copied from the same class-id row; novel rows re-randomized
    c_base, c_novel = base[7], LVIS_NOVEL_IDS[3]
    np.testing.assert_array_equal(W[c_base], W0[c_base])
    assert not np.allclose(W[c_novel], W0[c_novel])
    np.testing.assert_array_equal(W[-1], W0[-1])  # bg row preserved
    B = out["roi_heads.box_predictor.bbox_pred.weight"].numpy()
    B0 = sd["roi_heads.box_predictor.bbox_pred.weight"]
    np.testing.assert_array_equal(B[c_base * 4 : (c_base + 1) * 4], B0[c_base * 4 : (c_base + 1) * 4])


def test_lvis_combine_takes_novel_rows_from_src2(tmp_path):
    from lvc_tpu.data.builtin_meta import LVIS_NOVEL_IDS

    sd1, base_pth = _save(tmp_path, "base.pth", N_ALL, seed=1)
    sd2, novel_pth = _save(tmp_path, "novel.pth", len(LVIS_NOVEL_IDS), seed=2)
    _run(["--src1", base_pth, "--src2", novel_pth, "--method", "combine"], tmp_path)
    out = torch.load(str(tmp_path / "model_reset_combine.pth"), weights_only=False)["model"]
    W = out["roi_heads.box_predictor.cls_score.weight"].numpy()
    W1 = sd1["roi_heads.box_predictor.cls_score.weight"]
    W2 = sd2["roi_heads.box_predictor.cls_score.weight"]
    # i-th novel class row comes from src2 row i; base rows from src1 by id
    for i in (0, 100, len(LVIS_NOVEL_IDS) - 1):
        np.testing.assert_array_equal(W[LVIS_NOVEL_IDS[i]], W2[i])
    novel = set(LVIS_NOVEL_IDS)
    c_base = next(c for c in range(N_ALL) if c not in novel)
    np.testing.assert_array_equal(W[c_base], W1[c_base])
    np.testing.assert_array_equal(W[-1], W1[-1])
    B = out["roi_heads.box_predictor.bbox_pred.weight"].numpy()
    B2 = sd2["roi_heads.box_predictor.bbox_pred.weight"]
    i = 5
    c = LVIS_NOVEL_IDS[i]
    np.testing.assert_array_equal(B[c * 4 : (c + 1) * 4], B2[i * 4 : (i + 1) * 4])
