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


class TestNativeAudio:
    """Audio demux/decode + the Qwen3-Omni use_audio_in_video path
    (reference qwen3omni_model.py:140-181)."""

    @pytest.fixture(scope="class")
    def av_video(self, tmp_path_factory):
        from t2v_metrics_tpu.media import native_loader as nl

        if not nl.native_available() or not hasattr(nl._load(),
                                                    "t2v_test_write_av"):
            pytest.skip("native media library unavailable")
        p = str(tmp_path_factory.mktemp("av") / "clip.mkv")
        assert nl.write_test_av(p, 64, 48, 20, 10, 16000)
        return p

    def test_probe_and_decode(self, av_video, tmp_path):
        import cv2
        from t2v_metrics_tpu.media import native_loader as nl

        assert nl.has_audio(av_video)
        audio = nl.decode_audio(av_video, 16000)
        assert audio is not None and audio.dtype == np.float32
        assert abs(len(audio) - 32000) < 1600  # ~2s at 16kHz
        # 440 Hz sine at amplitude 12000/32768
        assert 0.3 < np.abs(audio).max() < 0.45
        # silent cv2 mp4 -> no audio stream
        q = str(tmp_path / "noaud.mp4")
        vw = cv2.VideoWriter(q, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
        for _ in range(5):
            vw.write(np.zeros((48, 64, 3), np.uint8))
        vw.release()
        assert not nl.has_audio(q)

    def test_omni_scores_video_with_own_audio(self, av_video):
        """The omni adapter must demux and splice the video's own audio
        track (use_audio_in_video)."""
        import t2v_metrics_tpu as t2v
        from t2v_metrics_tpu.models import qwen3omni as qo

        scorer = t2v.VQAScore(model="qwen3-omni-test")
        ad = scorer.model
        ids, feats_list = ad._assemble_content(av_video, None, "Any sound?")
        toks = [tok for tok, *_ in feats_list]
        assert ad.config.video_token_id in toks
        assert ad.config.audio_token_id in toks, \
            "audio track was not demuxed into an audio block"
        s = scorer(images=[av_video], texts=["a tone plays"])
        assert s.shape == (1, 1) and 0.0 <= float(s[0, 0]) <= 1.0

        # kwarg off -> no audio block
        off = t2v.VQAScore(model="qwen3-omni-test", use_audio_in_video=False)
        ids2, fl2 = off.model._assemble_content(av_video, None, "Any sound?")
        assert off.model.config.audio_token_id not in [t for t, *_ in fl2]


def test_png_batch_decode_matches_pil(tmp_path):
    """Native PNG decode: RGB, palette, grayscale, RGBA all normalized to
    PIL convert('RGB') parity."""
    from PIL import Image
    from t2v_metrics_tpu.media import native_loader as nl

    if not nl.native_available() or not hasattr(nl._load(),
                                                "t2v_decode_png_batch"):
        pytest.skip("native PNG decoder unavailable")
    rng = np.random.default_rng(0)
    paths = []
    rgb = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    gray = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    rgba = rng.integers(0, 255, (24, 40, 4), dtype=np.uint8)
    for name, arr, mode in [("rgb", rgb, "RGB"), ("gray", gray, "L"),
                            ("rgba", rgba, "RGBA")]:
        p = str(tmp_path / f"{name}.png")
        Image.fromarray(arr, mode).save(p)
        paths.append(p)
    pal = str(tmp_path / "pal.png")
    Image.fromarray(rgb, "RGB").convert("P", palette=Image.ADAPTIVE).save(pal)
    paths.append(pal)

    bufs = [open(p, "rb").read() for p in paths]
    ours = nl.decode_png_batch(bufs)
    for p, arr in zip(paths, ours):
        ref = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(arr, ref, err_msg=p)


class TestNativeClipResize:
    """Native batched bicubic resize must be bit-exact with the PIL path."""

    def test_bit_exact_both_modes(self):
        import numpy as np
        import pytest
        from t2v_metrics_tpu.media import native_loader as nl
        from t2v_metrics_tpu.media.images import clip_preprocess

        if not nl.native_available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        shapes = [(96, 96), (80, 128), (128, 80), (97, 53)]
        fill = tuple(int(x * 255)
                     for x in (0.48145466, 0.4578275, 0.40821073))
        for mode, pad in ((0, True), (1, False)):
            imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                    for h, w in shapes]
            nat = nl.clip_resize_batch(imgs, 64, mode=mode, fill=fill)
            if nat is None:
                pytest.skip("stale native build without clip_resize")
            ref = np.stack([
                clip_preprocess(im, 64, pad_square=pad, raw_uint8=True)
                for im in imgs])
            np.testing.assert_array_equal(nat, ref)
