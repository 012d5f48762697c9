"""Native media library tests: JPEG batch decode parity with PIL, video
frame extraction parity with OpenCV sequential decode."""

import io

import numpy as np
import pytest
from PIL import Image

from t2v_metrics_tpu.media import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.native_available(),
                                reason="native media library not built")


def _jpeg_bytes(arr, quality=90):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_jpeg_batch_decode_matches_pil():
    rng = np.random.default_rng(0)
    # smooth gradients compress/decompress deterministically
    imgs = []
    for i in range(6):
        base = np.linspace(0, 255, 64, dtype=np.uint8)
        img = np.stack(np.meshgrid(base, base)[0:1] * 3, axis=-1)[0]
        img = np.ascontiguousarray(np.tile(base[None, :, None], (48, 1, 3)))
        imgs.append(img)
    bufs = [_jpeg_bytes(im) for im in imgs]
    ours = nl.decode_jpeg_batch(bufs)
    for b, o in zip(bufs, ours):
        ref = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
        assert o.shape == ref.shape
        # libjpeg IDCT variants may differ by a couple LSBs from PIL
        assert np.abs(o.astype(int) - ref.astype(int)).max() <= 2


def test_jpeg_batch_bad_buffer_falls_back():
    good = _jpeg_bytes(np.zeros((8, 8, 3), np.uint8))
    out = nl.decode_jpeg_batch([good])
    assert out[0].shape == (8, 8, 3)


def test_video_info_and_frames(tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    frames = []
    for i in range(12):
        f = np.full((48, 64, 3), i * 20, np.uint8)
        frames.append(f)
        vw.write(f)
    vw.release()

    info = nl.video_info(path)
    assert info is not None
    assert info["width"] == 64 and info["height"] == 48
    assert abs(info["fps"] - 10.0) < 0.5

    out = nl.video_frames(path, [0, 5, 11])
    assert out is not None
    assert out.shape == (3, 48, 64, 3)
    # constant-valued frames: mean should track the written intensity
    means = out.reshape(3, -1).mean(axis=1)
    assert means[0] < means[1] < means[2]
