"""ctypes binding for the native media library (libt2vmedia.so).

Builds the library on first use (g++ + libjpeg/libav, see
native/build.sh); every entry point has a pure-Python fallback (PIL /
OpenCV) so the package works without a toolchain. The native path is the
production host-decode pipeline: batched multi-threaded JPEG decode and
exact sequential video frame extraction feeding device transfers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libt2vmedia.so")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                               check=True, capture_output=True)
            except Exception:
                _LIB = False
                return False
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _LIB = False
            return False
        lib.t2v_decode_jpeg_batch.restype = ctypes.c_int
        lib.t2v_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.t2v_video_info.restype = ctypes.c_int
        lib.t2v_video_info.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64)]
        lib.t2v_video_frames.restype = ctypes.c_int
        lib.t2v_video_frames.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_int64),
                                         ctypes.c_int, ctypes.c_void_p]
        try:  # PNG + audio entry points (newer builds)
            lib.t2v_decode_png_batch.restype = ctypes.c_int
            lib.t2v_decode_png_batch.argtypes = \
                lib.t2v_decode_jpeg_batch.argtypes
            lib.t2v_clip_resize_batch.restype = ctypes.c_int
            lib.t2v_clip_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.t2v_audio_probe.restype = ctypes.c_int
            lib.t2v_audio_probe.argtypes = [ctypes.c_char_p]
            lib.t2v_audio_decode.restype = ctypes.c_int64
            lib.t2v_audio_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                             ctypes.c_void_p, ctypes.c_int64]
            lib.t2v_test_write_av.restype = ctypes.c_int
            lib.t2v_test_write_av.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                              ctypes.c_int, ctypes.c_int,
                                              ctypes.c_int, ctypes.c_int]
            lib.t2v_test_write_av_seeded.restype = ctypes.c_int
            lib.t2v_test_write_av_seeded.argtypes = \
                lib.t2v_test_write_av.argtypes + [ctypes.c_int]
        except AttributeError:  # pragma: no cover — stale .so
            pass
        _LIB = lib
        return lib


def native_available() -> bool:
    return bool(_load())


def _decode_batch(fn_name: str, buffers: list[bytes], max_w: int,
                  max_h: int, num_threads: int):
    lib = _load()
    if not lib or not hasattr(lib, fn_name):
        from PIL import Image
        import io

        return [np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
                for b in buffers]

    n = len(buffers)
    keep = [np.frombuffer(b, dtype=np.uint8) for b in buffers]
    datas = (ctypes.c_void_p * n)(
        *[arr.ctypes.data_as(ctypes.c_void_p).value for arr in keep])
    lens = (ctypes.c_size_t * n)(*[arr.size for arr in keep])
    out = np.empty((n, max_h, max_w, 3), np.uint8)
    dims = (ctypes.c_int * (2 * n))()
    getattr(lib, fn_name)(
        ctypes.cast(datas, ctypes.POINTER(ctypes.c_void_p)), lens, n,
        out.ctypes.data_as(ctypes.c_void_p), dims, max_w, max_h, num_threads)
    results = []
    for i in range(n):
        h, w = dims[2 * i], dims[2 * i + 1]
        if h == 0:  # decode failed; fall back per-image
            from PIL import Image
            import io

            results.append(np.asarray(
                Image.open(io.BytesIO(buffers[i])).convert("RGB")))
        else:
            results.append(np.ascontiguousarray(
                out[i].reshape(-1)[: h * w * 3].reshape(h, w, 3)))
    return results


def decode_jpeg_batch(buffers: list[bytes], max_w: int = 8192,
                      max_h: int = 8192, num_threads: int = 0):
    """Decode a batch of JPEG byte buffers -> list of (H, W, 3) uint8.

    Uses the native thread pool; falls back to PIL when unavailable.
    """
    return _decode_batch("t2v_decode_jpeg_batch", buffers, max_w, max_h,
                         num_threads)


def decode_png_batch(buffers: list[bytes], max_w: int = 8192,
                     max_h: int = 8192, num_threads: int = 0):
    """Decode a batch of PNG byte buffers -> list of (H, W, 3) uint8
    (palette/gray/alpha normalized to RGB like PIL convert('RGB'))."""
    return _decode_batch("t2v_decode_png_batch", buffers, max_w, max_h,
                         num_threads)


def clip_resize_batch(images, size: int, mode: int = 0,
                      fill=(0, 0, 0), num_threads: int = 0):
    """Batched PIL-exact bicubic CLIP preprocessing -> (N, size, size, 3)
    uint8, or None when the native library is unavailable.

    mode 0: expand2square(fill) + resize (LLaVA 'pad' aspect mode).
    mode 1: shortest-side resize + center crop (torchvision/OpenCLIP).
    Bit-exact with PIL Image.resize(..., BICUBIC) — the C++ side mirrors
    Pillow's fixed-point separable resampling, so scores match the
    reference's PIL-preprocessed inputs exactly."""
    lib = _load()
    if not lib or not hasattr(lib, "t2v_clip_resize_batch"):
        return None
    n = len(images)
    if n == 0:
        return None
    keep = []
    ptrs = (ctypes.c_void_p * n)()
    dims = (ctypes.c_int * (2 * n))()
    for i, im in enumerate(images):
        if not (isinstance(im, np.ndarray) and im.dtype == np.uint8
                and im.ndim == 3 and im.shape[2] == 3):
            return None
        im = np.ascontiguousarray(im)
        keep.append(im)
        ptrs[i] = im.ctypes.data_as(ctypes.c_void_p).value
        dims[2 * i] = im.shape[0]
        dims[2 * i + 1] = im.shape[1]
    out = np.empty((n, size, size, 3), np.uint8)
    rc = lib.t2v_clip_resize_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), dims, n, size,
        mode, fill[0], fill[1], fill[2],
        out.ctypes.data_as(ctypes.c_void_p), num_threads)
    return out if rc == 0 else None


def video_info(path: str):
    """(total_frames, width, height, fps) via libavformat; None on failure."""
    lib = _load()
    if not lib:
        return None
    info = (ctypes.c_int64 * 5)()
    if lib.t2v_video_info(str(path).encode(), info) != 0:
        return None
    fps = info[3] / max(info[4], 1)
    return {"total_frames": int(info[0]), "width": int(info[1]),
            "height": int(info[2]), "fps": float(fps)}


def has_audio(path: str) -> bool:
    """Does the container carry an audio stream? (reference
    qwen3omni_model.py:140-148 probes with PyAV). False on any failure."""
    lib = _load()
    if not lib or not hasattr(lib, "t2v_audio_probe"):
        return False
    return lib.t2v_audio_probe(str(path).encode()) == 1


def decode_audio(path: str, rate: int = 16000,
                 max_seconds: float = 300.0) -> np.ndarray | None:
    """Demux+decode the audio stream of any container (video or audio
    file) to mono float32 at `rate` Hz. None when unavailable/absent."""
    lib = _load()
    if not lib or not hasattr(lib, "t2v_audio_decode"):
        return None
    max_samples = int(rate * max_seconds)
    out = np.empty((max_samples,), np.float32)
    n = lib.t2v_audio_decode(str(path).encode(), rate,
                             out.ctypes.data_as(ctypes.c_void_p), max_samples)
    if n <= 0:
        return None
    return out[:n].copy()


def write_test_av(path: str, w: int = 64, h: int = 48, n_frames: int = 20,
                  fps: int = 10, sr: int = 16000, seed: int = 0) -> bool:
    """Test-fixture MKV (mpeg4 video + pcm sine audio). True on success.
    ``seed`` varies the luma texture so distinct fixtures have distinct
    pixels (bench realism: identical device inputs would be served from
    execution caches)."""
    lib = _load()
    if not lib or not hasattr(lib, "t2v_test_write_av"):
        return False
    if seed and hasattr(lib, "t2v_test_write_av_seeded"):
        return lib.t2v_test_write_av_seeded(str(path).encode(), w, h,
                                            n_frames, fps, sr, seed) == 0
    return lib.t2v_test_write_av(str(path).encode(), w, h, n_frames, fps,
                                 sr) == 0


def video_frames(path: str, indices) -> np.ndarray | None:
    """Decode exact frames (sorted indices) -> (N, H, W, 3) uint8 RGB.

    Sequential decode (no lossy seeks, unlike cv2 CAP_PROP_POS_FRAMES).
    Returns None when the native library is unavailable.
    """
    lib = _load()
    if not lib:
        return None
    info = video_info(path)
    if info is None:
        return None
    idx = np.asarray(sorted(int(i) for i in indices), dtype=np.int64)
    out = np.empty((len(idx), info["height"], info["width"], 3), np.uint8)
    written = lib.t2v_video_frames(
        str(path).encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx),
        out.ctypes.data_as(ctypes.c_void_p))
    if written <= 0:
        return None
    return out[:written]
