"""Label verification: descriptor extraction + kNN confirmation.

Library core of the reference's tools/run_nearest_neighbours.py: cut
square context-padded 224x224 crops per candidate box (DatasetMapperQE /
get_crops_qe), embed with DINO ViT, all-shots x all-queries centered-cosine
kNN (sharded over the mesh), keep candidates whose detector label matches
the mode of the k nearest shot labels, and drop candidates overlapping
seen-class gt.
"""
from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lvc_tpu.data.catalog import DatasetCatalog
from lvc_tpu.data.dataset_mapper import read_image
from lvc_tpu.data.utils import get_crops_qe

logger = logging.getLogger(__name__)


def build_dino(name: str = "dino_vits8", weights_path: Optional[str] = None):
    """Build the verifier ViT; load DINO torch weights when available
    (checkpoints/<name>.pth, $DINO_WEIGHTS, or an explicit path)."""
    from lvc_tpu.modeling.backbone.vit import (
        convert_dino_torch_params,
        dino_vits8,
        dino_vits16,
    )

    model = {"dino_vits8": dino_vits8, "dino_vits16": dino_vits16}[name]()
    candidates = [
        weights_path,
        os.environ.get("DINO_WEIGHTS"),
        os.path.join("checkpoints", f"{name}.pth"),
    ]
    path = next((c for c in candidates if c and os.path.isfile(c)), None)
    if path:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        variables = convert_dino_torch_params(sd)
        logger.info("Loaded DINO weights from %s", path)
    else:
        logger.warning(
            "No DINO weights found (looked at %s); using RANDOM init — "
            "verification quality will be meaningless until weights are provided",
            candidates,
        )
        dummy = jnp.zeros((1, 224, 224, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, dummy)
    return model, variables


class DescriptorExtractor:
    """Batched crop embedding with a jitted ViT forward."""

    def __init__(self, model, variables, pixel_mean, pixel_std, batch: int = 64, crop_size: int = 224):
        self.model = model
        self.variables = variables
        self.mean = np.asarray(pixel_mean, np.float32)
        self.std = np.asarray(pixel_std, np.float32)
        self.batch = batch
        self.crop_size = crop_size
        self._fn = jax.jit(lambda v, x: model.apply(v, x))

    def embed_crops(self, crops: np.ndarray) -> np.ndarray:
        """(N, S, S, 3) uint8 RGB -> (N, D)."""
        n = len(crops)
        if n == 0:
            return np.zeros((0, 384), np.float32)
        out = []
        for i in range(0, n, self.batch):
            chunk = crops[i : i + self.batch]
            pad = self.batch - len(chunk)
            x = (chunk.astype(np.float32) - self.mean) / self.std
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], np.float32)])
            feats = np.asarray(self._fn(self.variables, jnp.asarray(x)))
            out.append(feats[: len(chunk)])
        return np.concatenate(out, axis=0)

    def extract_dataset(self, dataset_name: str, num_workers: int = 8, pk: float = 0.2):
        """-> dict with descriptors (N, D), classes (N,), ids (N,),
        boxes (N, 4 xyxy), image_ids (N,)."""
        dicts = DatasetCatalog.get(dataset_name)
        pool = ThreadPoolExecutor(num_workers)

        def load(d):
            img = read_image(d["file_name"], "RGB")
            boxes, classes, ids = [], [], []
            for a in d["annotations"]:
                # crowd/sub-band ignore regions are never verification
                # queries (reference lvc/data/dataset_mapper.py:379-393
                # drops iscrowd from DatasetMapperQE instances)
                if a.get("iscrowd", 0):
                    continue
                b = a["bbox"]
                from lvc_tpu.structures.boxes import BoxMode

                if a.get("bbox_mode", BoxMode.XYWH_ABS) == BoxMode.XYWH_ABS:
                    b = [b[0], b[1], b[0] + b[2], b[1] + b[3]]
                boxes.append(b)
                classes.append(a["category_id"])
                ids.append(a.get("id", -1))
            boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
            crops = get_crops_qe(img, boxes, crop_size=self.crop_size, pk=pk)
            return d["image_id"], crops, np.asarray(classes), np.asarray(ids), boxes

        all_desc, all_cls, all_ids, all_boxes, all_img = [], [], [], [], []
        for image_id, crops, classes, ids, boxes in pool.map(load, dicts):
            if len(crops) == 0:
                continue
            desc = self.embed_crops(crops)
            all_desc.append(desc)
            all_cls.append(classes)
            all_ids.append(ids)
            all_boxes.append(boxes)
            all_img.append(np.full(len(desc), image_id, dtype=np.int64))
        if not all_desc:
            return {
                "descriptors": np.zeros((0, 384), np.float32),
                "classes": np.zeros((0,), np.int64),
                "ids": np.zeros((0,), np.int64),
                "boxes": np.zeros((0, 4), np.float32),
                "image_ids": np.zeros((0,), np.int64),
            }
        return {
            "descriptors": np.concatenate(all_desc),
            "classes": np.concatenate(all_cls),
            "ids": np.concatenate(all_ids),
            "boxes": np.concatenate(all_boxes),
            "image_ids": np.concatenate(all_img),
        }


def verify_candidates(
    shots: Dict[str, np.ndarray],
    queries: Dict[str, np.ndarray],
    k: int = 10,
    cosine: bool = True,
    mesh=None,
) -> np.ndarray:
    """Keep mask over queries: detector label == mode of k nearest shot
    labels (get_nn_class_confirmatory, run_nearest_neighbours.py:214-227)."""
    from lvc_tpu.ops.knn import knn_vote, sharded_knn_vote

    num_classes = int(max(shots["classes"].max(initial=0), queries["classes"].max(initial=0))) + 1
    if mesh is not None:
        topk, mode = sharded_knn_vote(
            mesh,
            jnp.asarray(shots["descriptors"]),
            jnp.asarray(shots["classes"].astype(np.int32)),
            jnp.asarray(queries["descriptors"]),
            k=k,
            cosine=cosine,
            num_classes=num_classes,
        )
    else:
        topk, mode = knn_vote(
            jnp.asarray(shots["descriptors"]),
            jnp.asarray(shots["classes"].astype(np.int32)),
            jnp.asarray(queries["descriptors"]),
            k=k,
            cosine=cosine,
            num_classes=num_classes,
        )
        mode = np.asarray(mode)
    return np.asarray(mode) == queries["classes"]
