"""Synthetic geometric-shapes dataset (demo/e2e-validation stand-in).

The AFHQ data the reference trains on does not ship with this repo; this
deterministic generator gives the trainers a real learnable distribution —
class 0: filled circles, 1: squares, 2: triangles, each with random size,
position and color on a dark background — so class-conditional DDPM training
can be validated end-to-end (distinct classes must emerge in CFG samples).
"""

from __future__ import annotations

import numpy as np


class ShapesDataset:
    def __init__(self, n: int, img_size: int = 64, num_classes: int = 3,
                 seed: int = 0):
        self.n = n
        self.img_size = img_size
        self.num_classes = num_classes
        self.seed = seed
        self.class_names = ["circle", "square", "triangle"][:num_classes]

    def __len__(self):
        return self.n

    def load(self, idx: int):
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        s = self.img_size
        label = idx % self.num_classes
        img = np.full((s, s, 3), -0.9, np.float32)
        color = rng.uniform(0.2, 1.0, 3).astype(np.float32)
        cx, cy = rng.uniform(0.3, 0.7, 2) * s
        r = rng.uniform(0.15, 0.3) * s
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        if label == 0:      # circle
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
        elif label == 1:    # axis-aligned square
            mask = (np.abs(xx - cx) <= r) & (np.abs(yy - cy) <= r)
        else:               # upward triangle
            mask = ((yy <= cy + r)
                    & (yy >= cy - r)
                    & (np.abs(xx - cx) <= (yy - (cy - r)) / 2.0))
        img[mask] = color * 2.0 - 1.0  # shape in [-1, 1] color space
        return img, label
