"""Native (C++/libjpeg) decode backend: correctness vs the PIL path.

The native kernel shares the PIL backends' augmentation geometry (same rng
functions in the same order per sample seed) but resamples with its own
bilinear — images must track PIL within a couple of LSB, labels/order must
be identical, and the backend must be deterministic across runs."""

import io
import itertools
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from maskbit_tpu import native
from maskbit_tpu.data.tar_reader import TarImageDataset
from maskbit_tpu.data.transforms import EvalTransform, TrainTransform

pytestmark = pytest.mark.skipif(
    not native.is_available(),
    reason=f"native decoder unavailable: {native.build_error()}",
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """3 shards x smooth gradient JPEGs of varied sizes (+ one PNG member)."""
    root = tmp_path_factory.mktemp("native_shards")
    rng = np.random.default_rng(0)
    idx = 0
    sizes = [(375, 500), (123, 97), (600, 480), (256, 256), (50, 700)]
    for s in range(3):
        with tarfile.open(root / f"test-{s:04d}.tar", "w") as tar:
            for i in range(5):
                h, w = sizes[(idx + i) % len(sizes)]
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [(x * 0.7 + idx) % 256, (y * 0.9) % 256, ((x + y) * 0.4) % 256],
                    -1,
                ).astype(np.uint8)
                buf = io.BytesIO()
                if idx % 7 == 3:  # exercise the PIL fallback path
                    Image.fromarray(arr).save(buf, format="PNG")
                    ext = "png"
                else:
                    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
                    ext = "jpg"
                data = buf.getvalue()
                for name, payload in ((ext, data), ("cls", str(idx % 5).encode())):
                    info = tarfile.TarInfo(f"{idx:06d}.{name}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
                idx += 1
    return root


def _stream(shard_dir, backend, transform, n=15, threads=2, resample=True):
    ds = TarImageDataset(
        str(shard_dir / "test-{0000..0002}.tar"), transform,
        resample=resample, shuffle_buffer_size=8, seed=3,
        num_decode_threads=threads, decode_backend=backend,
    )
    return list(itertools.islice(iter(ds), n))


def test_native_matches_pil_train_stream(shard_dir):
    """Same seed -> same sample order, same labels, same crop/flip geometry;
    pixels within a small resample tolerance of the PIL backend."""
    t = lambda: TrainTransform(resolution=64, seed=7)
    pil = _stream(shard_dir, "thread", t())
    nat = _stream(shard_dir, "native", t())
    assert len(pil) == len(nat)
    for (img_p, lab_p), (img_n, lab_n) in zip(pil, nat):
        assert lab_p == lab_n
        assert img_n.shape == img_p.shape and img_n.dtype == np.float32
        diff = np.abs(img_p - img_n)
        # same geometry => tiny mean; a wrong crop/flip would be ~0.2+ mean.
        # The tail differs more: PIL's downscale "bilinear" widens its filter
        # support with the ratio (area-style) while the native kernel is
        # classic 2x2 bilinear (the OpenCV convention) — sharp edges can
        # disagree by tens of LSB at strong downscales.
        assert diff.mean() < 0.01, diff.mean()
        assert np.percentile(diff, 99.9) < 0.25


def test_native_matches_pil_bicubic_stream(shard_dir):
    """All generator configs set interpolation: bicubic — the native kernel
    implements Keys a=-0.5 bicubic (the PIL/torchvision BICUBIC kernel), so
    the backend stays active (it used to silently resample bilinear)."""
    t = lambda: TrainTransform(resolution=64, seed=7, interpolation="bicubic")
    pil = _stream(shard_dir, "thread", t())
    nat = _stream(shard_dir, "native", t())
    for (img_p, lab_p), (img_n, lab_n) in zip(pil, nat):
        assert lab_p == lab_n
        diff = np.abs(img_p - img_n)
        assert diff.mean() < 0.012, diff.mean()


def test_native_unsupported_interpolation_falls_back(shard_dir):
    """lanczos isn't implemented natively: the native backend must produce
    the PIL stream (fallback), not silently substitute a different filter."""
    t = lambda: TrainTransform(resolution=64, seed=7, interpolation="lanczos")
    pil = _stream(shard_dir, "thread", t(), n=8)
    nat = _stream(shard_dir, "native", t(), n=8)
    for (img_p, lab_p), (img_n, lab_n) in zip(pil, nat):
        assert lab_p == lab_n
        np.testing.assert_array_equal(img_p, img_n)  # identical: same PIL path


def test_native_matches_pil_eval_stream(shard_dir):
    pil = _stream(shard_dir, "thread", EvalTransform(resolution=64), resample=False)
    nat = _stream(shard_dir, "native", EvalTransform(resolution=64), resample=False)
    for (img_p, lab_p), (img_n, lab_n) in zip(pil, nat):
        assert lab_p == lab_n
        assert np.abs(img_p - img_n).mean() < 0.012


def test_native_stream_deterministic(shard_dir):
    t = lambda: TrainTransform(resolution=64, seed=7)
    a = _stream(shard_dir, "native", t(), threads=3)
    b = _stream(shard_dir, "native", t(), threads=1)
    for (img_a, lab_a), (img_b, lab_b) in zip(a, b):
        assert lab_a == lab_b
        np.testing.assert_array_equal(img_a, img_b)


def test_decode_crop_resize_geometry():
    """Crop box + flip semantics against PIL on the same box."""
    y, x = np.mgrid[0:300, 0:400]
    arr = np.stack([(x * 0.6) % 256, (y * 0.8) % 256, ((x + y) * 0.5) % 256],
                   -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    b = buf.getvalue()
    assert native.decode_info(b) == (400, 300)
    out = native.decode_crop_resize(b, 30, 40, 200, 300, 128, 128, False)
    ref = np.asarray(
        Image.open(io.BytesIO(b)).resize((128, 128), Image.BILINEAR,
                                         box=(40, 30, 340, 230))
    )
    diff = np.abs(out.astype(int) - ref.astype(int))
    # PIL widens its downscale filter with the ratio; classic 2x2 bilinear
    # disagrees by a few LSB in the tail, not in the bulk or the geometry
    assert diff.mean() < 0.7 and np.percentile(diff, 99) <= 3, (
        diff.mean(), np.percentile(diff, 99)
    )
    flipped = native.decode_crop_resize(b, 30, 40, 200, 300, 128, 128, True)
    np.testing.assert_array_equal(flipped, out[:, ::-1])


def test_invalid_jpeg_raises():
    with pytest.raises(ValueError):
        native.decode_info(b"not a jpeg at all")
    with pytest.raises(ValueError):
        native.decode_crop_resize(b"garbage", 0, 0, 10, 10, 8, 8, False)


def test_truncated_jpeg_errors_cleanly():
    """A severely truncated JPEG makes libjpeg longjmp out of the decode;
    the pixel buffer is owned OUTSIDE the setjmp frame so this must return
    a clean ValueError (no crash, no skipped destructor). Mild truncation
    is EOI-padded by libjpeg (decodes with a warning) — also exercised."""
    y, x = np.mgrid[0:200, 0:300]
    arr = np.stack([(x * 0.6) % 256, (y * 0.8) % 256, ((x + y) * 0.5) % 256],
                   -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    full = buf.getvalue()
    for _ in range(50):  # leak would accumulate; crash would abort
        with pytest.raises(ValueError):
            native.decode_crop_resize(full[: len(full) // 20],
                                      0, 0, 200, 300, 64, 64, False)
    # mild truncation: libjpeg pads to EOI and decodes (gray tail)
    out = native.decode_crop_resize(full[: len(full) // 2],
                                    0, 0, 200, 300, 64, 64, False)
    assert out.shape == (64, 64, 3)


def test_readonly_package_dir_builds_into_user_cache(tmp_path, monkeypatch):
    """Installed (read-only site-packages) layout: no prebuilt .so next to
    the package and an unwritable package dir must build into
    $XDG_CACHE_HOME/maskbit_tpu (keyed by source hash) instead of silently
    losing the native backend. os.access can't be used to simulate this as
    root, so patch it."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_error", None)
    # pretend the package-dir .so does not exist and the dir is unwritable
    monkeypatch.setattr(native, "_LIB_PATH", str(tmp_path / "ro" / "lib.so"))
    monkeypatch.setattr(native.os, "access", lambda p, m: False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))

    cache_path = native._cache_lib_path()
    assert str(tmp_path / "cache") in cache_path
    try:
        assert native.is_available(), native.build_error()
        assert os.path.exists(cache_path)
        w, h = native.decode_info(_tiny_jpeg())
        assert (w, h) == (48, 32)
    finally:
        # monkeypatch restores the globals' *attributes*, but a lib loaded
        # during the test must not leak into later tests' module state
        native._lib = None
        native._build_error = None


def _tiny_jpeg() -> bytes:
    buf = io.BytesIO()
    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(buf, format="JPEG")
    return buf.getvalue()
