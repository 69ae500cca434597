"""Detection visualization (development aid).

Counterpart of detectron2/utils/visualizer.py (Visualizer: boxes, labels,
masks, dataset-dict overlays). Built on PIL instead of matplotlib so it
works headless with no extra deps; covers the surface the detector
workflow actually uses: ``draw_instance_predictions`` on padded
Detections, ``draw_dataset_dict`` for gt overlays, and raw box/text/mask
primitives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from lvc_tpu.utils.colormap import colormap


class VisImage:
    def __init__(self, img: Image.Image):
        self.pil = img

    def save(self, filepath: str):
        self.pil.save(filepath)

    def get_image(self) -> np.ndarray:
        return np.asarray(self.pil)


class Visualizer:
    """img: (H, W, 3) uint8 RGB. ``metadata`` may expose ``thing_classes``."""

    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0):
        img = np.asarray(img_rgb).clip(0, 255).astype(np.uint8)
        self.img = Image.fromarray(img).convert("RGB")
        if scale != 1.0:
            self.img = self.img.resize(
                (int(self.img.width * scale), int(self.img.height * scale))
            )
        self.scale = scale
        self.metadata = metadata
        self._draw = ImageDraw.Draw(self.img, "RGBA")
        self._cmap = colormap(rgb=True)

    # ------------------------------------------------------------ primitives
    def _color(self, cls_id: int) -> tuple:
        c = self._cmap[int(cls_id) % len(self._cmap)]
        return tuple(int(v) for v in c)

    def draw_box(self, box_xyxy: Sequence[float], color=(0, 255, 0), width: int = 2):
        x0, y0, x1, y1 = [v * self.scale for v in box_xyxy]
        self._draw.rectangle([x0, y0, x1, y1], outline=tuple(color), width=width)
        return self

    def draw_text(self, text: str, position, color=(255, 255, 255)):
        x, y = position[0] * self.scale, position[1] * self.scale
        w = max(6 * len(text), 8)
        self._draw.rectangle([x, y, x + w, y + 11], fill=(0, 0, 0, 180))
        self._draw.text((x + 1, y), text, fill=tuple(color))
        return self

    def draw_binary_mask(self, mask: np.ndarray, color=(0, 255, 0), alpha: float = 0.4):
        m = np.asarray(mask, bool)
        overlay = np.zeros((*m.shape, 4), np.uint8)
        overlay[m] = (*color, int(alpha * 255))
        ov = Image.fromarray(overlay, "RGBA")
        if self.scale != 1.0:
            ov = ov.resize(self.img.size)
        self.img.paste(ov, (0, 0), ov)
        self._draw = ImageDraw.Draw(self.img, "RGBA")
        return self

    # --------------------------------------------------------------- overlays
    def _class_name(self, cls_id: int) -> str:
        names = getattr(self.metadata, "thing_classes", None) if self.metadata else None
        if names is None and isinstance(self.metadata, dict):
            names = self.metadata.get("thing_classes")
        if names and 0 <= int(cls_id) < len(names):
            return names[int(cls_id)]
        return str(int(cls_id))

    def draw_instance_predictions(
        self,
        boxes: np.ndarray,  # (D, 4) XYXY
        scores: np.ndarray,  # (D,)
        classes: np.ndarray,  # (D,)
        valid: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,  # (D, H, W) bool
    ) -> VisImage:
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        classes = np.asarray(classes)
        valid = np.ones(len(boxes), bool) if valid is None else np.asarray(valid, bool)
        for i in range(len(boxes)):
            if not valid[i]:
                continue
            color = self._color(classes[i])
            if masks is not None:
                self.draw_binary_mask(masks[i], color=color)
            self.draw_box(boxes[i], color=color)
            label = f"{self._class_name(classes[i])} {scores[i]:.0%}"
            self.draw_text(label, (boxes[i][0], boxes[i][1]), color=(255, 255, 255))
        return VisImage(self.img)

    def draw_dataset_dict(self, dataset_dict: dict) -> VisImage:
        """Overlay gt annotations of a catalog-format dict."""
        from lvc_tpu.structures.boxes import BoxMode

        for a in dataset_dict.get("annotations", []):
            b = list(map(float, a["bbox"]))
            if a.get("bbox_mode", BoxMode.XYWH_ABS) == BoxMode.XYWH_ABS:
                b = [b[0], b[1], b[0] + b[2], b[1] + b[3]]
            color = self._color(a.get("category_id", 0))
            self.draw_box(b, color=color)
            self.draw_text(self._class_name(a.get("category_id", 0)), (b[0], b[1]))
        return VisImage(self.img)
