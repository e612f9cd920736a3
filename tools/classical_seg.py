#!/usr/bin/env python
"""Classical-CV segmentation baseline demo.

Plays the role of the reference's GrabCut comparison demo (reference:
tools/grabcut.py — cv2.grabCut inside a box prior). OpenCV isn't in this
environment, so the demo implements a GrabCut-style iterative color-model
segmentation in numpy: 2-component k-means color models for fg/bg seeded
by the box prior, alternated with neighborhood smoothing — the classical
baseline to eyeball against the learned masks.

    python tools/classical_seg.py image.jpg [x y w h]
"""

from __future__ import annotations

import sys

import numpy as np
from PIL import Image


def _kmeans(pixels: np.ndarray, k: int, iters: int = 10,
            seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centers = pixels[rng.choice(len(pixels), k, replace=False)]
    for _ in range(iters):
        d = ((pixels[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            sel = pixels[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return centers


def box_grabcut(image: np.ndarray, box, iters: int = 8) -> np.ndarray:
    """GrabCut-style segmentation: box prior + iterated color models.

    image: HxWx3 uint8; box: (x, y, w, h) like cv2.grabCut's rect.
    Returns HxW bool foreground mask (inside the box only).
    """
    h, w = image.shape[:2]
    x, y, bw, bh = [int(v) for v in box]
    img = image.astype(np.float32)

    inside = np.zeros((h, w), bool)
    inside[y:y + bh, x:x + bw] = True
    fg = inside.copy()
    # hard background: everything outside the box prior (like grabCut's
    # GC_BGD region); the bg color model is built from it every round so
    # a stray fg-colored corner pixel can never poison the bg model.
    hard_bg = ~inside

    for _ in range(iters):
        fg_px = img[fg]
        bg_px = img[hard_bg]
        if len(fg_px) < 4 or len(bg_px) < 4:
            break
        fg_c = _kmeans(fg_px, 2)
        bg_c = _kmeans(bg_px, 2)
        flat = img.reshape(-1, 3)
        d_fg = ((flat[:, None] - fg_c[None]) ** 2).sum(-1).min(1)
        d_bg = ((flat[:, None] - bg_c[None]) ** 2).sum(-1).min(1)
        new_fg = (d_fg < d_bg).reshape(h, w) & inside
        # neighborhood smoothing (poor man's pairwise term)
        pad = np.pad(new_fg, 1)
        votes = sum(pad[1 + dy:h + 1 + dy, 1 + dx:w + 1 + dx]
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
        new_fg = (votes >= 5) & inside
        if (new_fg == fg).all():
            break
        fg = new_fg
    return fg


def main():
    path = sys.argv[1]
    img = np.asarray(Image.open(path).convert("RGB"))
    h, w = img.shape[:2]
    if len(sys.argv) >= 6:
        box = tuple(int(v) for v in sys.argv[2:6])
    else:
        box = (w // 4, h // 4, w // 2, h // 2)
    mask = box_grabcut(img, box)
    out = img.copy()
    out[~mask] = (out[~mask] * 0.3).astype(np.uint8)
    Image.fromarray(out).save("classical_seg_output.png")
    print(f"box {box}: {mask.sum()} fg pixels "
          f"-> classical_seg_output.png")


if __name__ == "__main__":
    main()
