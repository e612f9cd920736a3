#!/usr/bin/env python
"""GrabCut: GMM color models + graph-cut segmentation.

Real GrabCut (Rother et al. 2004), matching what the reference's demo
gets from cv2.grabCut (reference: tools/grabcut.py:19-53: box prior,
16 iterations, 5-component GMMs — the `(1, 65)` model arrays are
5 x (weight + 3 mean + 9 cov)). OpenCV isn't in this image, so:

* the fg/bg Gaussian mixture models are fit in numpy (k-means init,
  then the GrabCut EM-style loop: assign each pixel to its best
  component, refit each component from its pixels);
* the energy minimisation is a true min-cut on the 8-connected grid
  (native/graphcut.cpp, Dinic max-flow via ctypes), with the paper's
  terms: data = -log p(color | GMM), smoothness
  V = gamma * exp(-beta*||z_i - z_j||^2) / dist(i,j),
  beta = 1/(2 <||z_i - z_j||^2>), gamma = 50.

CLI mirrors the reference demo: resize to 320x480, a random 10-15px
border box prior, 16 iterations, side-by-side render.

    python tools/grabcut.py image.jpg [out.png]
"""

from __future__ import annotations

import ctypes
import os
import random
import subprocess
import sys

import numpy as np

RESIZE_WIDTH = 320
RESIZE_HEIGHT = 480
N_COMPONENTS = 5   # cv2 GC model: 65 doubles = 5 * (1 + 3 + 9)
GAMMA = 50.0

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, "native")


def _load_graphcut():
    so = os.path.join(_NATIVE_DIR, "libgraphcut.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE_DIR, "libgraphcut.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.grid_maxflow.restype = ctypes.c_double
    lib.grid_maxflow.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8)]
    return lib


def grid_mincut(src: np.ndarray, snk: np.ndarray,
                nlink: np.ndarray) -> np.ndarray:
    """Min-cut labels (1 = source/fg side) for an h x w grid.

    src/snk: [h, w] terminal capacities; nlink: [h, w, 4] undirected
    n-link capacities toward E, S, SE, SW.
    """
    lib = _load_graphcut()
    h, w = src.shape
    src = np.ascontiguousarray(src, np.float64)
    snk = np.ascontiguousarray(snk, np.float64)
    nlink = np.ascontiguousarray(nlink, np.float64)
    labels = np.zeros(h * w, np.uint8)
    lib.grid_maxflow(
        h, w,
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        snk.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nlink.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return labels.reshape(h, w).astype(bool)


class GMM:
    """Full-covariance Gaussian mixture (the GrabCut color model)."""

    def __init__(self, k: int = N_COMPONENTS):
        self.k = k
        self.weights = np.full(k, 1.0 / k)
        self.means = np.zeros((k, 3))
        self.covs = np.stack([np.eye(3)] * k)
        self._update_cached()

    def _update_cached(self):
        covs = self.covs + 1e-3 * np.eye(3)  # cv2-style regularisation
        self.inv = np.linalg.inv(covs)
        self.logdet = np.log(np.linalg.det(covs))

    def fit_kmeans(self, pixels: np.ndarray, seed: int = 0):
        rng = np.random.RandomState(seed)
        centers = pixels[rng.choice(len(pixels), self.k,
                                    replace=len(pixels) < self.k)]
        assign = np.zeros(len(pixels), np.int32)
        for _ in range(8):
            d = ((pixels[:, None] - centers[None]) ** 2).sum(-1)
            assign = d.argmin(1)
            for j in range(self.k):
                sel = pixels[assign == j]
                if len(sel):
                    centers[j] = sel.mean(0)
        self.refit(pixels, assign)

    def component(self, pixels: np.ndarray) -> np.ndarray:
        """Most likely component per pixel (GrabCut step 1)."""
        return self._log_prob_per_k(pixels).argmax(1)

    def refit(self, pixels: np.ndarray, assign: np.ndarray):
        """Refit every component from its assigned pixels (step 2)."""
        n = len(pixels)
        for j in range(self.k):
            sel = pixels[assign == j]
            if len(sel) < 4:
                continue
            self.weights[j] = len(sel) / n
            self.means[j] = sel.mean(0)
            d = sel - self.means[j]
            self.covs[j] = d.T @ d / len(sel)
        self.weights /= self.weights.sum()
        self._update_cached()

    def _log_prob_per_k(self, pixels: np.ndarray) -> np.ndarray:
        d = pixels[:, None, :] - self.means[None]          # [N, K, 3]
        maha = np.einsum("nki,kij,nkj->nk", d, self.inv, d)
        return (np.log(self.weights + 1e-12)[None]
                - 0.5 * (self.logdet[None] + maha))

    def neg_log_prob(self, pixels: np.ndarray) -> np.ndarray:
        """-log p(z) under the mixture (the data term)."""
        lp = self._log_prob_per_k(pixels)
        m = lp.max(1, keepdims=True)
        return -(m[:, 0] + np.log(np.exp(lp - m).sum(1) + 1e-30))


def _smoothness(img: np.ndarray) -> np.ndarray:
    """[h, w, 4] n-link capacities toward E, S, SE, SW (paper eq. 11)."""
    z = img.astype(np.float64)
    h, w = z.shape[:2]
    diffs = []
    # squared color differences per direction, zero-padded at borders
    d_e = np.zeros((h, w))
    d_e[:, :-1] = ((z[:, 1:] - z[:, :-1]) ** 2).sum(-1)
    d_s = np.zeros((h, w))
    d_s[:-1, :] = ((z[1:] - z[:-1]) ** 2).sum(-1)
    d_se = np.zeros((h, w))
    d_se[:-1, :-1] = ((z[1:, 1:] - z[:-1, :-1]) ** 2).sum(-1)
    d_sw = np.zeros((h, w))
    d_sw[:-1, 1:] = ((z[1:, :-1] - z[:-1, 1:]) ** 2).sum(-1)
    diffs = np.stack([d_e, d_s, d_se, d_sw], -1)

    counts = (d_e[:, :-1].size + d_s[:-1].size + d_se[:-1, :-1].size
              + d_sw[:-1, 1:].size)
    beta = 1.0 / (2.0 * diffs.sum() / counts + 1e-12)
    dist = np.array([1.0, 1.0, np.sqrt(2.0), np.sqrt(2.0)])
    return GAMMA / dist[None, None] * np.exp(-beta * diffs)


# mask labels, cv2 conventions (reference tools/grabcut.py:32)
GC_BGD, GC_FGD, GC_PR_BGD, GC_PR_FGD = 0, 1, 2, 3


def grab_cut(img: np.ndarray, rect, iters: int = 16,
             seed: int = 0) -> np.ndarray:
    """GrabCut with a rectangle prior.

    img: [h, w, 3] uint8; rect: (x0, y0, x1, y1) — outside is definite
    background. Returns the cv2-style label mask [h, w] uint8.
    """
    h, w = img.shape[:2]
    x0, y0, x1, y1 = rect
    mask = np.full((h, w), GC_BGD, np.uint8)
    mask[y0:y1, x0:x1] = GC_PR_FGD

    z = img.reshape(-1, 3).astype(np.float64)
    nlink = _smoothness(img)
    # terminal capacity for hard constraints: above any possible cut
    hard = 1.0 + GAMMA * 9.0 * max(h, w)

    fg, bg = GMM(), GMM()
    flat = mask.reshape(-1)
    fg.fit_kmeans(z[(flat == GC_FGD) | (flat == GC_PR_FGD)], seed)
    bg.fit_kmeans(z[(flat == GC_BGD) | (flat == GC_PR_BGD)], seed + 1)

    for _ in range(iters):
        # steps 1+2: component assignment and model refit
        fg_sel = (flat == GC_FGD) | (flat == GC_PR_FGD)
        bg_sel = ~fg_sel
        fg.refit(z[fg_sel], fg.component(z[fg_sel]))
        bg.refit(z[bg_sel], bg.component(z[bg_sel]))

        # step 3: min cut. source=fg: cap to source is the BG data term
        # (cutting it assigns the pixel to bg), and vice versa.
        src = bg.neg_log_prob(z)   # pay this to be FG
        snk = fg.neg_log_prob(z)
        src = np.where(flat == GC_BGD, 0.0, src)
        snk = np.where(flat == GC_BGD, hard, snk)
        src = np.where(flat == GC_FGD, hard, src)
        snk = np.where(flat == GC_FGD, 0.0, snk)

        fg_side = grid_mincut(src.reshape(h, w), snk.reshape(h, w),
                              nlink)
        new = np.where(
            flat.reshape(h, w) == GC_BGD, GC_BGD,
            np.where(flat.reshape(h, w) == GC_FGD, GC_FGD,
                     np.where(fg_side, GC_PR_FGD, GC_PR_BGD)))
        if np.array_equal(new, mask):
            mask = new
            break
        mask = new
        flat = mask.reshape(-1)
    return mask


def resize_grabcut(img: np.ndarray, seed: int | None = None):
    """Resize + box-prior GrabCut (reference tools/grabcut.py:19-35)."""
    from PIL import Image as PILImage

    img = np.asarray(PILImage.fromarray(img).resize(
        (RESIZE_WIDTH, RESIZE_HEIGHT), PILImage.BILINEAR))
    border = random.randint(10, 15) if seed is None else seed
    rect = (border, border, img.shape[1] - border, img.shape[0] - border)
    mask = grab_cut(img, rect, iters=16)
    keep = ((mask == GC_FGD) | (mask == GC_PR_FGD)).astype(np.uint8)
    return img * keep[:, :, None]


def main():
    from PIL import Image as PILImage
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    image = np.asarray(PILImage.open(sys.argv[1]).convert("RGB"))
    image = np.asarray(PILImage.fromarray(image).resize(
        (RESIZE_WIDTH, RESIZE_HEIGHT), PILImage.BILINEAR))
    result = resize_grabcut(image)

    fig, axes = plt.subplots(1, 2, figsize=(8, 6))
    axes[0].imshow(image)
    axes[0].set_title("Orignal")
    axes[1].imshow(result)
    axes[1].set_title("GrabCut")
    for a in axes:
        a.set_xticks([])
        a.set_yticks([])
    out = sys.argv[2] if len(sys.argv) > 2 else "grabcut_output.png"
    fig.savefig(out, bbox_inches="tight")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
