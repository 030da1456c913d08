"""Native C++ loader tests: build, decode parity vs PIL, resize quality,
augmentation semantics, throughput sanity."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from pggan_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader build failed")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rs = np.random.RandomState(0)
    # smooth image (JPEG-friendly) at a non-square-ish size
    base = rs.randint(0, 256, (7, 9, 3)).astype(np.uint8)
    smooth = np.asarray(Image.fromarray(base).resize((144, 112), Image.BILINEAR))
    jpg = root / "a.jpg"
    Image.fromarray(smooth).save(jpg, quality=95)
    png = root / "b.png"
    Image.fromarray(rs.randint(0, 256, (64, 48, 3), dtype=np.uint8)).save(png)
    return {"jpg": str(jpg), "png": str(png), "smooth": smooth}


class TestDecode:
    def test_png_decode_exact(self, image_files):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(4)
        got = loader.decode(image_files["png"])
        want = np.asarray(Image.open(image_files["png"]).convert("RGB"))
        np.testing.assert_array_equal(got, want)

    def test_jpeg_decode_close_to_pil(self, image_files):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(4)
        got = loader.decode(image_files["jpg"]).astype(np.int16)
        want = np.asarray(Image.open(image_files["jpg"]).convert("RGB")).astype(np.int16)
        assert got.shape == want.shape
        # IDCT implementations differ by ±2 levels
        assert np.mean(np.abs(got - want)) < 2.0

    def test_missing_file_raises(self):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(4)
        with pytest.raises(IOError):
            loader.load("/nonexistent/x.jpg")


class TestPngVariants:
    def test_trns_palette_gray_and_rgba_decode_safely(self, tmp_path):
        """Palette/gray PNGs with a tRNS chunk expand to RGBA inside
        libpng — alpha must be stripped for ANY source (a conditional
        strip overflowed the w*3 row buffers and aborted the process)."""
        from pggan_tpu.native.loader import NativeImageLoader
        rs = np.random.RandomState(3)
        pal = Image.fromarray(
            rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)).convert("P")
        pal.save(tmp_path / "pal_trns.png", transparency=5)
        Image.fromarray(rs.randint(0, 255, (32, 32), dtype=np.uint8),
                        "L").save(tmp_path / "gray_trns.png", transparency=7)
        Image.fromarray(rs.randint(0, 255, (32, 32, 4), dtype=np.uint8),
                        "RGBA").save(tmp_path / "rgba.png")
        nl = NativeImageLoader(16, augment=False)
        for name in ("pal_trns.png", "gray_trns.png", "rgba.png"):
            arr = nl.load(str(tmp_path / name))
            assert arr.shape == (16, 16, 3) and arr.dtype == np.uint8


class TestResize:
    @pytest.mark.parametrize("size", [4, 16, 64])
    def test_resize_close_to_pil(self, image_files, size):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(size, augment=False)
        got = loader.load(image_files["jpg"]).astype(np.float32)
        want = np.asarray(
            Image.open(image_files["jpg"]).convert("RGB").resize(
                (size, size), Image.BILINEAR)).astype(np.float32)
        # antialiased triangle filtering vs PIL's — close but not identical
        assert np.mean(np.abs(got - want)) < 6.0

    def test_upscale(self, image_files):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(256, augment=False)
        out = loader.load(image_files["png"])
        assert out.shape == (256, 256, 3)


class TestAugment:
    def test_deterministic_given_seed(self, image_files):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(32, augment=True)
        a = loader.load(image_files["jpg"], np.random.RandomState(5))
        b = loader.load(image_files["jpg"], np.random.RandomState(5))
        np.testing.assert_array_equal(a, b)

    def test_varies_across_seeds(self, image_files):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(32, augment=True)
        a = loader.load(image_files["jpg"], np.random.RandomState(1))
        b = loader.load(image_files["jpg"], np.random.RandomState(2))
        assert not np.array_equal(a, b)

    def test_no_rng_means_clean(self, image_files):
        from pggan_tpu.native import NativeImageLoader
        loader = NativeImageLoader(32, augment=True)
        a = loader.load(image_files["jpg"], None)
        b = NativeImageLoader(32, augment=False).load(image_files["jpg"])
        np.testing.assert_array_equal(a, b)


class TestDatasetIntegration:
    def test_folder_dataset_uses_native(self, image_files):
        from pggan_tpu.data import ImageFolderDataset
        root = os.path.dirname(image_files["jpg"])
        ds = ImageFolderDataset([root], 2, use_native=True)
        img = ds.get(0, np.random.RandomState(0))
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8

    def test_pil_fallback_matches_shape(self, image_files):
        from pggan_tpu.data import ImageFolderDataset
        root = os.path.dirname(image_files["jpg"])
        ds_n = ImageFolderDataset([root], 3, use_native=True, augment=False)
        ds_p = ImageFolderDataset([root], 3, use_native=False, augment=False)
        a = ds_n.get(0, np.random.RandomState(0)).astype(np.float32)
        b = ds_p.get(0, np.random.RandomState(0)).astype(np.float32)
        assert a.shape == b.shape
        assert np.mean(np.abs(a - b)) < 6.0

    def test_native_not_slower_than_pil(self, image_files):
        """Decode+resize+augment throughput at 256² output, decode cache
        OFF so the native decode path is actually measured (with the
        cache both loaders would just time jitter). Bound: native must
        beat PIL outright with margin — it loses its reason to exist
        otherwise. (Name says what is asserted: NOT slower; absolute
        speedups vary with image size/codec.)"""
        from pggan_tpu.data import ImageFolderDataset
        root = os.path.dirname(image_files["jpg"])
        ds_n = ImageFolderDataset([root], 6, use_native=True,
                                  cache_decoded=False)
        ds_p = ImageFolderDataset([root], 6, use_native=False,
                                  cache_decoded=False)
        assert ds_n._cache is None and ds_p._cache is None
        rng = np.random.RandomState(0)
        for ds in (ds_n, ds_p):          # warm libjpeg/PIL init
            ds.get(0, rng)
        reps = 40
        t0 = time.time()
        for i in range(reps):
            ds_n.get(i, np.random.RandomState(i))
        t_native = time.time() - t0
        t0 = time.time()
        for i in range(reps):
            ds_p.get(i, np.random.RandomState(i))
        t_pil = time.time() - t0
        assert t_native < t_pil * 1.2, (t_native, t_pil)
