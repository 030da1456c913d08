"""Datasets: folder-of-images (reference-compatible) and synthetic.

Parity with `lib/dataset.py:86-127` (`UnsupervisedDataset`):
  * recursive glob of `*.*g` files over every root in dataset_root_list
    (`lib/dataset.py:91-99` — matches .jpg/.jpeg/.png)
  * per-scale resize to 2**(scale_index+2) square (`:101`)
  * augmentation: horizontal flip p=0.5, color jitter
    (brightness 0.2, contrast 0.2, saturation 0.2, hue 0.01) (`:103-106`)
  * normalize to [-1, 1] — we keep images uint8 on the host and do the
    final normalize on device inside the jitted step (4× less host→HBM
    traffic); semantics identical
  * 70/30 train/valid split (`pggan/model.py:123-126`)

Color-jitter follows torchvision semantics: each factor sampled
U[max(0,1-v), 1+v] (hue U[-h, h]), applied in random order.
"""

from __future__ import annotations

import glob
import os
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance

_IMG_PATTERN = "*.*g"   # reference's glob (`lib/dataset.py:92`): jpg/jpeg/png


def list_image_paths(dataset_root_list: Sequence[str]) -> List[str]:
    """Recursive image listing, mirroring `lib/dataset.py:91-99`."""
    paths: List[str] = []
    for root in dataset_root_list:
        paths.extend(glob.glob(os.path.join(root, _IMG_PATTERN)))
        for sub_root, dirs, _ in os.walk(root):
            for d in dirs:
                paths.extend(glob.glob(os.path.join(sub_root, d, _IMG_PATTERN)))
    return paths


def _apply_color_jitter(img: Image.Image, rng: np.random.RandomState,
                        brightness: float = 0.2, contrast: float = 0.2,
                        saturation: float = 0.2, hue: float = 0.01) -> Image.Image:
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(("brightness", f))
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(("contrast", f))
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(("saturation", f))
    if hue > 0:
        f = rng.uniform(-hue, hue)
        ops.append(("hue", f))
    rng.shuffle(ops)
    for name, f in ops:
        if name == "brightness":
            img = ImageEnhance.Brightness(img).enhance(f)
        elif name == "contrast":
            img = ImageEnhance.Contrast(img).enhance(f)
        elif name == "saturation":
            img = ImageEnhance.Color(img).enhance(f)
        elif name == "hue":
            hsv = np.array(img.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(round(f * 255))) % 256
            img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


class ImageFolderDataset:
    """Folder-of-images dataset producing augmented uint8 NHWC samples.

    Decode/resize/augment runs in the native C++ loader when available
    (libjpeg/libpng + antialiased resampling, GIL released — see
    `pggan_tpu/native/`); `use_native=False` forces the PIL path.

    Decode cache (`cache_decoded`): source decode + per-scale resize is by
    far the dominant host cost (a 1024² PNG decodes in ~50 ms; the whole
    per-draw flip+jitter at training resolution is microseconds), and the
    progressive schedule revisits every image hundreds of times per scale.
    When the resized-at-scale dataset fits `decode_cache_mb`, each image is
    decoded ONCE per scale and per-draw augmentation runs over the cached
    uint8 array. Semantics note: the cache quantizes to uint8 between
    resize and jitter — exactly where the reference's PIL pipeline
    quantizes (Resize yields a uint8 image before ColorJitter,
    `lib/dataset.py:103-108`); cached-vs-uncached NATIVE draws differ by
    ≤1 LSB (measured). Native-vs-PIL jitter itself is distributionally
    equivalent but not bit-exact (float chain vs per-op uint8
    quantization; up to ~4 LSB — see loader.cpp header).
    """

    def __init__(self, dataset_root_list: Sequence[str], scale_index: int = 0,
                 *, is_master: bool = False, augment: bool = True,
                 paths: Optional[Sequence[str]] = None,
                 use_native: Optional[bool] = None,
                 cache_decoded="auto", decode_cache_mb: int = 8192,
                 resized_store="auto", store_dir: Optional[str] = None):
        self.paths = list(paths) if paths is not None else list_image_paths(dataset_root_list)
        if not self.paths:
            raise FileNotFoundError(
                f"no images found under {list(dataset_root_list)!r}")
        self.resolution = 2 ** (scale_index + 2)
        self.augment = augment
        self._native = None
        if use_native is not False:
            try:
                from pggan_tpu.native import NativeImageLoader, native_available
                if native_available():
                    self._native = NativeImageLoader(self.resolution,
                                                     augment=augment)
                elif use_native:
                    raise RuntimeError("native loader requested but build failed")
            except Exception:
                if use_native:
                    raise
        cache_bytes = len(self.paths) * self.resolution ** 2 * 3
        if cache_decoded == "auto" or cache_decoded is None:
            cache = cache_bytes <= int(decode_cache_mb) * (1 << 20)
        else:
            cache = bool(cache_decoded)
        # Out-of-core tier (data/resized_store.py): when the resized
        # dataset exceeds the RAM budget — the reference's real 37,345-
        # image workload at ≥512² (README.md:7) — build/reuse a per-scale
        # uint8 memmap instead of falling back to per-draw decode.
        # True forces the store (RAM cache off); 'auto' engages it only
        # when the RAM cache doesn't fit AND a store_dir is known.
        self._store = None
        if resized_store is True:
            if store_dir is None:
                raise ValueError("resized_store=true requires "
                                 "resized_store_dir")
            cache = False
        use_store = (resized_store is True
                     or (resized_store == "auto" and not cache
                         and store_dir is not None))
        self._cache: Optional[dict] = {} if cache else None
        self._cache_lock = threading.Lock()
        if use_store:
            from pggan_tpu.data.resized_store import ResizedStore
            self._store = ResizedStore(store_dir, self.paths,
                                       self.resolution,
                                       self._resize_uncached,
                                       verbose=is_master)
        if is_master:
            backend = "native" if self._native is not None else "PIL"
            cached = (f", decode cache {cache_bytes / 1e6:.1f} MB"
                      if cache else "")
            if self._store is not None:
                cached = (f", resized store "
                          f"{self._store.nbytes / 1e6:.1f} MB on disk")
            print(f"Dataset of {len(self)} images constructed for the "
                  f"training ({backend} loader{cached}).")

    def __len__(self) -> int:
        return len(self.paths)

    def _resize_uncached(self, path: str) -> np.ndarray:
        """Decode + resize to training resolution (no augmentation)."""
        if self._native is not None:
            try:
                return self._native.resize(path)
            except IOError:
                self._warn_fallback(path)
        img = Image.open(path).convert("RGB")
        # torchvision Resize((s, s)) default interpolation is bilinear.
        img = img.resize((self.resolution, self.resolution), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)

    def resized_array(self, index: int) -> np.ndarray:
        """UNAUGMENTED decoded+resized uint8 HWC image — the array the
        device-resident cache uploads once per scale (per-draw flip/jitter
        then runs in-graph; `data/device_cache.py`). Uses the decode cache
        when enabled so the host pays each decode once either way."""
        path = self.paths[index % len(self.paths)]
        if self._cache is not None:
            arr = self._cache.get(path)
            if arr is None:
                arr = self._resize_uncached(path)
                with self._cache_lock:
                    arr = self._cache.setdefault(path, arr)
            return arr
        if self._store is not None:
            return self._store.read(index)
        return self._resize_uncached(path)

    def _warn_fallback(self, path: str):
        # libjpeg/libpng rejects some variants PIL handles (CMYK JPEGs,
        # exotic PNGs) — per-image PIL fallback instead of killing the
        # pipeline mid-run
        if not getattr(self, "_warned_fallback", False):
            self._warned_fallback = True
            print(f"[pggan_tpu.data] native decode failed for "
                  f"{path!r}; using PIL for such images")

    def get(self, index: int, rng: np.random.RandomState) -> np.ndarray:
        path = self.paths[index % len(self.paths)]
        if self._cache is not None or self._store is not None:
            if self._store is not None:
                arr = self._store.read(index)
            else:
                arr = self._cache.get(path)
                if arr is None:
                    arr = self._resize_uncached(path)
                    with self._cache_lock:       # racing first draws both
                        arr = self._cache.setdefault(path, arr)  # decode; 1 wins
            if not self.augment:
                return arr
            if self._native is not None:
                return self._native.augment_cached(
                    arr, rng if self.augment else None)
            img = Image.fromarray(arr)
            if rng.rand() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            img = _apply_color_jitter(img, rng)
            return np.asarray(img, dtype=np.uint8)
        if self._native is not None:
            try:
                return self._native.load(path, rng if self.augment else None)
            except IOError:
                self._warn_fallback(path)
        img = Image.open(path).convert("RGB")
        img = img.resize((self.resolution, self.resolution), Image.BILINEAR)
        if self.augment:
            if rng.rand() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            img = _apply_color_jitter(img, rng)
        return np.asarray(img, dtype=np.uint8)


class SyntheticDataset:
    """Deterministic random images — for smoke tests and benchmarking.

    Each index maps to a fixed pseudo-random image (seeded by index), so
    runs are reproducible and no filesystem is required.
    """

    def __init__(self, size: int = 4096, scale_index: int = 0, **_unused):
        self.size = size
        self.resolution = 2 ** (scale_index + 2)

    def __len__(self) -> int:
        return self.size

    def get(self, index: int, rng: np.random.RandomState) -> np.ndarray:
        r = np.random.RandomState(index % self.size)
        base = r.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((self.resolution, self.resolution),
                                         Image.BILINEAR), dtype=np.uint8)
        return img


class PairedFaceDataset:
    """Source/target face pairs for face-swap training — the
    `FaceDatasetTrain` analog (`lib/dataset.py:9-55`): with probability
    `same_prob` the target IS the source (same_person=1), otherwise a
    random image from a random root. Fixed 256×256 resize like the
    reference. Returns (Xs, Xt, same_person) as uint8/uint8/int."""

    def __init__(self, dataset_root_list: Sequence[str], *,
                 is_master: bool = False, same_prob: float = 0.2,
                 resolution: int = 256):
        # Per-root path lists are kept: the reference's cross-identity
        # target draw picks a ROOT uniformly, then an image within it
        # (`lib/dataset.py:44-46`) — path-uniform sampling would weight
        # large roots more when roots differ in size.
        self.per_root = [ps for ps in (list_image_paths([r])
                                       for r in dataset_root_list) if ps]
        self.paths = [p for ps in self.per_root for p in ps]
        if not self.paths:
            raise FileNotFoundError(
                f"no images found under {list(dataset_root_list)!r}")
        self.same_prob = same_prob
        self.resolution = resolution
        if is_master:
            print(f"Dataset of {len(self)} images constructed for the training.")

    def __len__(self) -> int:
        return len(self.paths)

    def _load(self, path: str, rng: np.random.RandomState) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        img = img.resize((self.resolution, self.resolution), Image.BILINEAR)
        if rng.rand() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        img = _apply_color_jitter(img, rng)
        return np.asarray(img, dtype=np.uint8)

    def get(self, index: int, rng: np.random.RandomState):
        src_path = self.paths[index % len(self.paths)]
        xs = self._load(src_path, rng)
        if rng.rand() > self.same_prob:
            root = self.per_root[rng.randint(len(self.per_root))]
            xt = self._load(root[rng.randint(len(root))], rng)
            same = 0
        else:
            xt = self._load(src_path, rng)
            same = 1
        return xs, xt, same


class PairedValidDataset:
    """Fixed source/target validation pairs — the `FaceDatasetValid` analog
    (`lib/dataset.py:57-83`): sorted {root}/source/* and {root}/target/*,
    length = min of the two, resize only (no augmentation)."""

    def __init__(self, valid_data_dir: str, *, is_master: bool = False,
                 resolution: int = 256):
        self.source_paths = sorted(
            list_image_paths([os.path.join(valid_data_dir, "source")]))
        self.target_paths = sorted(
            list_image_paths([os.path.join(valid_data_dir, "target")]))
        self.n = min(len(self.source_paths), len(self.target_paths))
        self.resolution = resolution
        if is_master:
            print(f"Dataset of {self.n} images constructed for the validation.")

    def __len__(self) -> int:
        return self.n

    def _load(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        img = img.resize((self.resolution, self.resolution), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)

    def get(self, index: int, rng=None):
        return (self._load(self.source_paths[index]),
                self._load(self.target_paths[index]))


def split_dataset(n: int, train_frac: float = 0.7, seed: int = 42
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """70/30 random split of indices (reference `pggan/model.py:123-126`;
    `round` semantics of the train count preserved)."""
    n_train = int(round(n * train_frac))
    perm = np.random.RandomState(seed).permutation(n)
    return perm[:n_train], perm[n_train:]


def build_dataset(cfg, scale_index: int, *, is_master: bool = False):
    """Dataset factory honoring `data_backend`:
    'auto' → folder if any dataset_root_list entries exist, else synthetic;
    'folder' / 'synthetic' force a backend."""
    backend = str(cfg.data_backend)
    roots = list(cfg.dataset_root_list or [])
    if backend == "auto":
        backend = "folder" if any(os.path.isdir(r) for r in roots) else "synthetic"
    if backend == "folder":
        store_dir = (cfg["resized_store_dir"]
                     if "resized_store_dir" in cfg else None)
        if store_dir is None and "save_root" in cfg:
            store_dir = os.path.join(str(cfg.save_root), "resized_store")
        return ImageFolderDataset(
            roots, scale_index, is_master=is_master,
            augment=(bool(cfg["augment"]) if "augment" in cfg else True),
            cache_decoded=(cfg["cache_decoded"]
                           if "cache_decoded" in cfg else "auto"),
            decode_cache_mb=(int(cfg["decode_cache_mb"])
                             if "decode_cache_mb" in cfg else 8192),
            resized_store=(cfg["resized_store"]
                           if "resized_store" in cfg else "auto"),
            store_dir=store_dir)
    if backend == "synthetic":
        return SyntheticDataset(int(cfg.synthetic_dataset_size), scale_index)
    raise ValueError(f"unknown data backend {backend!r}")
