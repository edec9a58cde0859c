"""Native C++ runtime: PNG decode + in-order prefetch executor.

Oracle is PIL: grayscale PNGs must decode byte-exact; RGB->luma within +-1
(fixed-point rounding).  The prefetch stream must deliver frames in exact
path order no matter how decode completes across the thread pool.
"""

import os

import numpy as np
import pytest
from PIL import Image

from libviso_tpu import native
from libviso_tpu.io.kitti import StereoImageStream

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime did not build here")


def _save(tmp_path, name, arr, mode):
    p = str(tmp_path / name)
    Image.fromarray(arr, mode).save(p)
    return p


def test_decode_gray_exact(tmp_path, rng):
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    p = _save(tmp_path, "g.png", img, "L")
    assert np.array_equal(native.decode_png_gray(p), img)
    assert native.png_dims(p) == (37, 53)


def test_decode_rgb_luma_matches_pil(tmp_path, rng):
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    p = _save(tmp_path, "c.png", img, "RGB")
    got = native.decode_png_gray(p).astype(int)
    ref = np.asarray(Image.open(p).convert("L")).astype(int)
    assert np.abs(got - ref).max() <= 1


def test_decode_rgba_and_16bit(tmp_path, rng):
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    p = _save(tmp_path, "a.png", rgba, "RGBA")
    assert native.decode_png_gray(p).shape == (8, 8)

    g16 = rng.integers(0, 65536, (8, 8), dtype=np.uint16)
    p16 = str(tmp_path / "g16.png")
    Image.fromarray(g16).save(p16)
    out = native.decode_png_gray(p16)
    assert out.shape == (8, 8)
    # strip_16 keeps the high byte
    assert np.array_equal(out, (g16 >> 8).astype(np.uint8))


def test_decode_errors(tmp_path):
    with pytest.raises(IOError):
        native.decode_png_gray(str(tmp_path / "missing.png"))
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png at all")
    with pytest.raises(IOError):
        native.decode_png_gray(bad)


def test_stream_in_order(tmp_path, rng):
    paths, imgs = [], []
    for i in range(30):
        img = rng.integers(0, 256, (10 + i, 20), dtype=np.uint8)
        paths.append(_save(tmp_path, f"s{i}.png", img, "L"))
        imgs.append(img)
    with native.NativeImageStream(paths, threads=4, depth=3) as s:
        got = list(s)
    assert len(got) == 30
    for a, b in zip(got, imgs):
        assert np.array_equal(a, b)


def test_stream_empty_and_close_idempotent():
    s = native.NativeImageStream([], threads=2, depth=2)
    assert s.next() is None
    s.close()
    s.close()


def test_stereo_stream_uses_native(tmp_path, rng):
    """StereoImageStream end-to-end over the native prefetcher."""
    n = 6
    lefts, rights = [], []
    for i in range(n):
        l = rng.integers(0, 256, (12, 18), dtype=np.uint8)
        r = rng.integers(0, 256, (12, 18), dtype=np.uint8)
        _save(tmp_path, "L%06d.png" % i, l, "L")
        _save(tmp_path, "R%06d.png" % i, r, "L")
        lefts.append(l)
        rights.append(r)
    stream = StereoImageStream(str(tmp_path / "L%06d.png"),
                               str(tmp_path / "R%06d.png"), prefetch=4)
    frames = list(stream)
    assert len(frames) == n
    for (gl, gr), el, er in zip(frames, lefts, rights):
        assert np.array_equal(gl, el) and np.array_equal(gr, er)


def test_stream_error_propagates_and_stream_continues(tmp_path, rng):
    """A corrupt file mid-stream raises on ITS frame; later frames still
    arrive in order (the C++ pool keeps going)."""
    imgs, paths = [], []
    for i in range(5):
        img = rng.integers(0, 256, (8, 12), dtype=np.uint8)
        p = str(tmp_path / f"s{i}.png")
        Image.fromarray(img, "L").save(p)
        paths.append(p)
        imgs.append(img)
    with open(paths[2], "wb") as f:
        f.write(b"garbage not a png")

    with native.NativeImageStream(paths, threads=2, depth=2) as s:
        assert np.array_equal(s.next(), imgs[0])
        assert np.array_equal(s.next(), imgs[1])
        with pytest.raises(IOError):
            s.next()
        assert np.array_equal(s.next(), imgs[3])
        assert np.array_equal(s.next(), imgs[4])
        assert s.next() is None


def test_pil_fallback_propagates_decode_errors(tmp_path, rng, monkeypatch):
    """The PIL prefetch fallback must raise for a corrupt frame instead of
    silently truncating the stream (same contract as the native path)."""
    from PIL import Image

    from libviso_tpu.io import kitti as kio

    for i in range(3):
        for side in ("l", "r"):
            img = rng.integers(0, 255, (16, 24)).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / f"{side}-{i:02d}.png")
    # corrupt frame 1's left image
    (tmp_path / "l-01.png").write_bytes(b"not a png at all")

    # force the PIL path even when the native runtime is available
    monkeypatch.setattr(kio, "_native", lambda: None)
    stream = kio.StereoImageStream(str(tmp_path / "l-%02d.png"),
                                   str(tmp_path / "r-%02d.png"))
    it = iter(stream)
    next(it)  # frame 0 decodes fine
    with pytest.raises(Exception):
        list(it)  # frame 1 must raise, not end the stream


def test_decode_jpeg_matches_pil(tmp_path):
    """Native libjpeg grayscale decode is bit-identical to PIL's (same
    IJG decoder underneath)."""
    from PIL import Image

    from libviso_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (48, 80), dtype=np.uint8)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(arr).save(p, quality=92)
    ours = native.decode_image_gray(p)
    ref = np.asarray(Image.open(p).convert("L"), dtype=np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_stream_mixed_formats(tmp_path):
    from PIL import Image

    from libviso_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(4)
    paths = []
    arrs = []
    for i, ext in enumerate([".png", ".jpg", ".png"]):
        a = rng.integers(0, 256, (32, 40), dtype=np.uint8)
        p = str(tmp_path / f"f{i}{ext}")
        Image.fromarray(a).save(p)
        paths.append(p)
        arrs.append(a)
    with native.NativeImageStream(paths, threads=2, depth=2) as s:
        out = list(s)
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], arrs[0])  # png lossless
    np.testing.assert_array_equal(out[2], arrs[2])


def test_mono_image_stream(tmp_path):
    from PIL import Image

    from libviso_tpu.io.kitti import MonoImageStream

    rng = np.random.default_rng(5)
    for i in range(1, 4):
        a = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        Image.fromarray(a).save(str(tmp_path / f"img-{i:04d}.jpg"))
    frames = list(MonoImageStream(str(tmp_path / "img-%04d.jpg"), begin=1))
    assert len(frames) == 3
    assert frames[0].shape == (24, 32)
    # skipped() starts later
    assert len(list(MonoImageStream(str(tmp_path / "img-%04d.jpg"),
                                    begin=1).skipped(2))) == 1


def test_decode_image_gray_png_is_not_capped(tmp_path, rng):
    """PNGs must take the exact-size path (dims peeked from the header),
    never the JPEG staging-buffer cap: a PNG bigger than max_hw decodes
    fine."""
    img = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    p = _save(tmp_path, "big.png", img, "L")
    out = native.decode_image_gray(p, max_hw=(4, 4))  # cap << image
    assert np.array_equal(out, img)


def test_mono_stream_pil_fallback_is_threaded(tmp_path, monkeypatch):
    """Without the native runtime, MonoImageStream must still prefetch on
    a worker thread (decode overlaps the consumer) and propagate decode
    errors to the consumer."""
    import threading

    from libviso_tpu.io import kitti as kio

    monkeypatch.setattr(kio, "_native", lambda: None)
    rng = np.random.default_rng(5)
    seen_threads = set()
    orig = kio._read_gray

    def spy(path):
        seen_threads.add(threading.current_thread().name)
        return orig(path)

    monkeypatch.setattr(kio, "_read_gray", spy)
    for i in range(3):
        a = rng.integers(0, 256, (16, 24), dtype=np.uint8)
        Image.fromarray(a).save(str(tmp_path / f"m-{i:04d}.png"))
    frames = list(kio.MonoImageStream(str(tmp_path / "m-%04d.png")))
    assert len(frames) == 3
    assert threading.main_thread().name not in seen_threads

    with open(str(tmp_path / "m-0003.png"), "wb") as f:
        f.write(b"corrupt")
    with pytest.raises(Exception):
        list(kio.MonoImageStream(str(tmp_path / "m-%04d.png")))


@pytest.mark.slow
def test_vn_no_jpeg_build_keeps_png(tmp_path, rng):
    """The -DVN_NO_JPEG fallback build (hosts with libpng but no libjpeg,
    native/build.py) must keep PNG decode working and report JPEGs as
    bad-format rather than crashing or mis-decoding."""
    import ctypes
    import subprocess
    import sys

    from libviso_tpu.native import build as nbuild

    so = str(tmp_path / "nojpeg.so")
    proc = subprocess.run(
        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
         "-DVN_NO_JPEG", nbuild._SRC, "-lpng", "-lz", "-o", so],
        capture_output=True, text=True, timeout=120)
    if proc.returncode != 0:
        pytest.skip(f"no libpng-only toolchain here: {proc.stderr[:100]}")
    lib = ctypes.CDLL(so)
    lib.vn_version.restype = ctypes.c_int
    assert lib.vn_version() == 2
    lib.vn_decode_image_gray.restype = ctypes.c_int
    lib.vn_decode_image_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

    img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    png = _save(tmp_path, "a.png", img, "L")
    jpg = _save(tmp_path, "a.jpg", img, "L")

    def decode(path):
        buf = np.empty(20 * 30, np.uint8)
        h, w = ctypes.c_int(), ctypes.c_int()
        rc = lib.vn_decode_image_gray(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size, ctypes.byref(h), ctypes.byref(w))
        return rc, buf, h.value, w.value

    rc, buf, h, w = decode(png)
    assert rc == 0 and (h, w) == (20, 30)
    assert np.array_equal(buf.reshape(20, 30), img)
    rc, *_ = decode(jpg)
    assert rc == -2  # bad format: JPEG decoder compiled out
