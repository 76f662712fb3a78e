"""Named preset recipes (speech_tpu.models.presets)."""

import numpy as np
import pytest

from speech_tpu import models


@pytest.mark.parametrize("name", sorted(models.PRESETS))
def test_presets_construct_and_compute(name):
    c = models.create(name, dtype="float64")
    rate = int(c.sampling_rate)
    rng = np.random.RandomState(hash(name) % 2 ** 31)
    feats = c.compute_full(rng.randn(rate // 4))
    assert feats.ndim == 2 and feats.shape[1] == c.num_coeffs
    assert np.isfinite(feats).all()


def test_preset_config_is_a_copy():
    a = models.preset_config("fbank-40-16k")
    a["bank"]["num_filts"] = 7
    assert models.PRESETS["fbank-40-16k"]["bank"]["num_filts"] == 40


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        models.preset_config("mfcc-13-16k")


def test_cli_accepts_preset_name(tmp_path):
    pytest.importorskip("torch")
    import os
    import wave

    from speech_tpu.command_line import signals_to_torch_feat_dir

    rng = np.random.RandomState(5)
    wav = os.path.join(tmp_path, "u.wav")
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((rng.randn(8000) * 1000).astype(np.int16).tobytes())
    mp = os.path.join(tmp_path, "map.txt")
    with open(mp, "w") as f:
        f.write(f"u {wav}\n")
    out = os.path.join(tmp_path, "out")
    assert signals_to_torch_feat_dir([mp, "fbank-80-16k", out]) == 0
    import torch

    assert torch.load(os.path.join(out, "u.pt")).shape[1] == 80
