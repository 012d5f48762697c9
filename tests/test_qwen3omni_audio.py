"""Golden parity: our Qwen3-Omni audio encoder vs tiny random HF
Qwen3OmniMoeAudioEncoder (chunked conv front-end, windowed attention)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import Qwen3OmniMoeAudioEncoder
from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import Qwen3OmniMoeAudioEncoderConfig

from t2v_metrics_tpu.models import qwen3omni_audio as qa


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_cfg = Qwen3OmniMoeAudioEncoderConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_mel_bins=32, max_source_positions=1500,
        n_window=8, n_window_infer=32, downsample_hidden_size=12,
        output_dim=48, activation_function="gelu", scale_embedding=False,
        conv_chunksize=500,
    )
    hf = Qwen3OmniMoeAudioEncoder(hf_cfg).eval()
    cfg = qa.AudioEncoderConfig(
        d_model=32, layers=2, heads=4, ffn_dim=64, num_mel_bins=32,
        n_window=8, n_window_infer=32, downsample_hidden=12, output_dim=48)
    params = qa.convert_audio_encoder(hf.state_dict(), cfg)
    return hf, cfg, params


@pytest.mark.parametrize("t_mel", [16, 40, 37])
def test_audio_encoder_parity(setup, t_mel):
    hf, cfg, params = setup
    rng = np.random.default_rng(t_mel)
    mel = rng.standard_normal((32, t_mel)).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_features=torch.from_numpy(mel),
                 feature_lens=torch.tensor([t_mel])).last_hidden_state.numpy()
    ours = np.asarray(qa.encode_audio(params, cfg, mel))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_geometry():
    cfg = qa.AudioEncoderConfig(n_window=8, n_window_infer=32, num_mel_bins=32)
    chunk_lens, valid, seg, total = qa.audio_geometry(40, cfg)
    assert sum(chunk_lens) == 40
    assert chunk_lens[-1] == 40 % 16 or chunk_lens[-1] == 16
    assert total == valid.sum()
    assert seg.min() >= -1


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow


def test_log_mel_device_parity():
    """Device DFT-as-matmul log-mel vs WhisperFeatureExtractor
    (the host path qwen3omni_adapter.load_audio_mel falls back to).
    Reference mel front-end: qwen_omni_utils audio load + Whisper fbank."""
    from transformers import WhisperFeatureExtractor

    rng = np.random.default_rng(7)
    for n_sec in (0.5, 2.3):
        audio = (rng.standard_normal(int(16000 * n_sec)) * 0.1).astype(np.float32)
        dev = qa.log_mel_device(audio, n_mels=128)
        fe = WhisperFeatureExtractor(feature_size=128, sampling_rate=16000,
                                     hop_length=160, chunk_length=30, n_fft=400)
        ref = fe(audio, sampling_rate=16000, padding=False,
                 return_tensors="np")["input_features"][0]
        assert dev.shape == ref.shape
        np.testing.assert_allclose(dev, ref, atol=5e-4)
