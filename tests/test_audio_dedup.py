"""Audio fingerprint dedup: gain-invariance of the energy-delta-sign
fingerprint and the end-to-end WAV → frames → fingerprint → group
pipeline."""

from __future__ import annotations

import numpy as np

from trx_spark.operators.multimodal import (
    audio_fingerprint,
    audio_frame_features,
    audio_neardup_groups,
    encode_wav,
    read_binary_assets,
)

_RATE = 16000


def _tone(seed=3, seconds=2.2):
    rng = np.random.default_rng(seed)
    t = np.arange(int(_RATE * seconds)) / _RATE
    # amplitude-modulated tone with SEED-DEPENDENT modulation — each
    # seed gets a distinct RMS envelope (what the fingerprint reads)
    f1, f2 = rng.uniform(1.0, 3.0), rng.uniform(4.0, 8.0)
    env = 0.4 + 0.3 * np.sin(2 * np.pi * f1 * t) + 0.1 * np.sin(2 * np.pi * f2 * t)
    sig = env * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 1e-4, t.shape)
    return (0.5 * sig).astype(np.float64)


def _assets(spark, tmp_path, clips: dict[str, np.ndarray]):
    for name, samples in clips.items():
        (tmp_path / name).write_bytes(encode_wav(samples, rate=_RATE))
    return read_binary_assets(spark, str(tmp_path / "*.wav"), "audio")


def test_fingerprint_gain_invariant(spark, tmp_path):
    base = _tone()
    clips = {
        "a_base.wav": base,
        "b_louder.wav": base * 1.8,          # re-encode at higher gain
        "c_other.wav": _tone(seed=77)[::-1],  # different clip
    }
    feats = audio_frame_features(_assets(spark, tmp_path, clips), codec="wav")
    fp = {r["file"].rsplit("/", 1)[-1]: r["afp"] for r in audio_fingerprint(feats).collect()}
    assert fp["a_base.wav"] == fp["b_louder.wav"]
    assert fp["c_other.wav"] != fp["a_base.wav"]


def test_audio_neardup_groups_e2e(spark, tmp_path):
    base = _tone(seed=11)
    clips = {
        "x.wav": base,
        "y_dup.wav": base * 0.6,
        "z.wav": _tone(seed=42) * 0.9,
    }
    feats = audio_frame_features(_assets(spark, tmp_path, clips), codec="wav")
    groups = audio_neardup_groups(feats).collect()
    sizes = sorted(r["n_clips"] for r in groups)
    assert sizes == [1, 2]
    dup = next(r for r in groups if r["n_clips"] == 2)
    assert dup["keeper_file"].endswith("x.wav")
