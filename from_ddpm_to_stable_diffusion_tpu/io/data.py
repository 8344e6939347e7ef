"""Image-folder input pipeline with threaded decode + device prefetch.

Replaces the reference's torchvision ``ImageFolder`` + ``DataLoader``
(03/04/06 ``utils.py``, e.g. 06_tiny_stable_diffusion/utils.py:21-29) with a
dependency-free loader: directory scan → per-class labels → PIL decode +
resize in a thread pool → NHWC float32 batches normalized with the same
ImageNet statistics → background prefetch queue so host IO overlaps device
compute. Batches are fixed-shape (drop-remainder) to keep XLA shapes static.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

IMAGENET_MEANS = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STDS = np.asarray([0.229, 0.224, 0.225], np.float32)

_IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def denormalize(x):
    """Invert ImageNet normalization on NHWC arrays (jnp or np)."""
    return x * IMAGENET_STDS + IMAGENET_MEANS


class ImageFolderDataset:
    """`root/<class_name>/*.jpg` → (image NHWC float32 normalized, label int)."""

    def __init__(self, root: str, img_size: int,
                 normalize: bool = True, to_unit_range: bool = False):
        self.root = root
        self.img_size = img_size
        self.normalize = normalize
        self.to_unit_range = to_unit_range  # [-1, 1] instead of ImageNet norm
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        self.class_names = classes
        self.samples: list[tuple[str, int]] = []
        for label, cls in enumerate(classes):
            cdir = os.path.join(root, cls)
            for fn in sorted(os.listdir(cdir)):
                if os.path.splitext(fn)[1].lower() in _IMG_EXTS:
                    self.samples.append((os.path.join(cdir, fn), label))
        if not self.samples:
            raise ValueError(f"no images found under {root}")

    def __len__(self):
        return len(self.samples)

    def load(self, idx: int):
        from PIL import Image

        path, label = self.samples[idx]
        with Image.open(path) as im:
            im = im.convert("RGB").resize((self.img_size, self.img_size),
                                          Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0
        if self.to_unit_range:
            arr = arr * 2.0 - 1.0
        elif self.normalize:
            arr = (arr - IMAGENET_MEANS) / IMAGENET_STDS
        return arr, label


class SyntheticImageDataset:
    """Deterministic random images for tests/benchmarks (no files needed)."""

    def __init__(self, n: int, img_size: int, channels: int = 3,
                 num_classes: int = 3, seed: int = 0):
        self.n = n
        self.img_size = img_size
        self.channels = channels
        self.num_classes = num_classes
        self.seed = seed
        self.class_names = [f"class_{i}" for i in range(num_classes)]

    def __len__(self):
        return self.n

    def load(self, idx: int):
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        img = rng.uniform(-1, 1, (self.img_size, self.img_size,
                                  self.channels)).astype(np.float32)
        return img, int(idx % self.num_classes)


class SyntheticVideoDataset:
    """Deterministic moving-shape clips for video-diffusion tests/demos.

    Each item is a (T, S, S, 3) clip in [-1, 1]: a bright square whose
    motion direction is the CLASS label (0=right, 1=down, 2=diagonal) —
    per-frame appearance is identical across classes, so a model can only
    separate them by learning TEMPORAL structure (exactly what the
    factorized temporal-attention layers exist for).
    """

    def __init__(self, n: int, img_size: int, frames: int = 8,
                 num_classes: int = 3, seed: int = 0):
        self.n = n
        self.img_size = img_size
        self.frames = frames
        self.num_classes = num_classes
        self.seed = seed
        self.class_names = ["right", "down", "diag"][:num_classes]

    def __len__(self):
        return self.n

    def load(self, idx: int):
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        label = int(idx % self.num_classes)
        s = self.img_size
        sq = max(2, s // 4)
        hi = max(1, s - sq - self.frames)  # keep full motion in-bounds
        x0 = int(rng.integers(0, hi))
        y0 = int(rng.integers(0, hi))
        dx, dy = [(1, 0), (0, 1), (1, 1)][label]
        color = rng.uniform(0.5, 1.0, (3,)).astype(np.float32)
        clip = np.full((self.frames, s, s, 3), -1.0, np.float32)
        for f in range(self.frames):
            xx, yy = x0 + f * dx, y0 + f * dy
            clip[f, yy:yy + sq, xx:xx + sq] = color
        return clip, label


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Stage upcoming batches on device (batch-sharded over the mesh's data
    axis) so host→HBM transfer overlaps the current step's compute."""
    import collections

    from ..parallel import shard_batch

    buf = collections.deque()
    it = iter(iterator)

    def put(batch):
        return shard_batch(mesh, batch) if mesh is not None else batch

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            continue


class DataLoader:
    """Shuffled, fixed-shape, prefetching batch iterator.

    ``decode_threads`` parallelize image decode; ``prefetch`` batches are
    staged in a background thread so ``next()`` rarely blocks.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_remainder: bool = True,
                 decode_threads: int = 8, prefetch: int = 2):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.decode_threads = decode_threads
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _batches(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1
        stop = (len(idx) // self.batch_size * self.batch_size
                if self.drop_remainder else len(idx))
        with ThreadPoolExecutor(self.decode_threads) as pool:
            for s in range(0, stop, self.batch_size):
                chunk = idx[s : s + self.batch_size]
                results = list(pool.map(self.ds.load, chunk))
                imgs = np.stack([r[0] for r in results])
                labels = np.asarray([r[1] for r in results], np.int32)
                yield imgs, labels

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list[BaseException] = []

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # surface on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
