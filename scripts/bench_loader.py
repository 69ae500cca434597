"""Input-pipeline throughput benchmark (host-side, no TPU required).

SURVEY.md §7 flags "host decode can bottleneck a v5e-8" as a hard part:
serving at ~150 img/s/chip needs the pipeline to decode + resize +
normalize/pad/space-to-depth at that rate per chip. This measures the
per-core rates of each stage and the end-to-end mapper on synthetic
COCO-sized JPEGs:

  1. JPEG decode + shortest-edge resize (native C++ core, GIL-free)
  2. DatasetMapper eval path (decode -> resize -> tensorize)
  3. s2d_canvas (fused native normalize + pad + 2x2 space-to-depth)

Usage: python scripts/bench_loader.py [--images 48] [--workers 4]
"""
import argparse
import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpegs(n: int, h: int, w: int, tmpdir: str):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    # smooth random fields compress like natural photos (pure noise JPEGs
    # decode unrealistically slowly; flat fields unrealistically fast)
    base = rng.rand(h // 8 + 1, w // 8 + 1, 3) * 255
    for i in range(n):
        img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
        img = np.clip(img + rng.randn(h, w, 3) * 8, 0, 255).astype(np.uint8)
        p = os.path.join(tmpdir, f"img_{i:04d}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
        base = np.roll(base, i + 1, axis=1)
    return paths


def rate(fn, items, reps=2):
    fn(items[0])  # warm
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for it in items:
            fn(it)
            n += 1
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--height", type=int, default=612)
    ap.add_argument("--width", type=int, default=1012)
    ap.add_argument("--workers", type=int, default=max(os.cpu_count() or 1, 1))
    args = ap.parse_args()

    from lvc_tpu.config import get_cfg
    from lvc_tpu.data import native_io
    from lvc_tpu.data.dataset_mapper import DatasetMapper, read_image
    

    with tempfile.TemporaryDirectory() as tmpdir:
        paths = make_jpegs(args.images, args.height, args.width, tmpdir)
        print(f"native C++ io available: {native_io.available()}")

        r_decode = rate(lambda p: read_image(p), paths)
        print(f"decode+load             : {r_decode:7.1f} img/s/core")

        if native_io.available():
            r_dr = rate(lambda p: native_io.load_resize(p, 800), paths)
            print(f"decode+resize (native)  : {r_dr:7.1f} img/s/core")

        cfg = get_cfg()
        cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
        mapper = DatasetMapper(cfg, is_train=False)
        dicts = [
            {"file_name": p, "image_id": i, "height": args.height, "width": args.width}
            for i, p in enumerate(paths)
        ]
        # the eval mapper is the COMPLETE host pipeline: decode -> resize ->
        # normalize -> pad-to-canvas -> 2x2 space-to-depth (image_s2d)
        r_map = rate(mapper, dicts)
        out = mapper(dicts[0])
        print(
            f"full eval mapper        : {r_map:7.1f} img/s/core  "
            f"(-> image_s2d {tuple(out['image_s2d'].shape)})"
        )

        # standalone cost of the fused normalize+pad+s2d pass (the native
        # single-pass kernel the mapper uses, csrc/imageio.cpp)
        from lvc_tpu.data.transforms import s2d_canvas

        canvas = tuple(out["canvas"])
        img_u8 = (np.zeros((args.height, args.width, 3)) + 127).astype(np.uint8)
        mean = [103.53, 116.28, 123.675]
        std = [1.0, 1.0, 1.0]
        r_s2d = rate(lambda im: s2d_canvas(im, canvas, mean, std), [img_u8] * 8)
        print(f"normalize+pad+s2d alone : {r_s2d:7.1f} img/s/core  (canvas {canvas})")

        serving = 150.0
        print(
            f"host cores per chip to sustain {serving:.0f} img/s/chip: "
            f"{serving / r_map:4.1f} (loader threads overlap device compute; "
            f"DATALOADER.NUM_WORKERS={cfg.DATALOADER.NUM_WORKERS})"
        )


if __name__ == "__main__":
    main()
