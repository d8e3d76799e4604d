"""Round-6 regression tests: ADVICE fixes (per-item codec fallback for
wave.Error / truncated containers, compact dirty-file detection under a
relative index root) and optimization-preserving invariants for the
operators whose internals changed this round.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest


def _float_wav() -> bytes:
    """RIFF/WAVE payload with format tag 3 (IEEE float) — the stdlib
    wave module raises wave.Error('unknown format: 3') on it."""
    samples = (np.sin(np.linspace(0, 20, 256)) * 0.5).astype("<f4")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_float_wav_raises_wave_error():
    """Precondition: the payload genuinely triggers wave.Error, so the
    fallback test below exercises the advertised failure class."""
    with pytest.raises(wave.Error):
        with wave.open(io.BytesIO(_float_wav()), "rb") as f:
            f.getnframes()


def test_non_pcm_wav_degrades_to_stub():
    """ADVICE (high): wave.Error must take the per-item stub path, not
    kill the stage — the docstring's 'non-PCM WAV degrades per-item'
    contract."""
    from embedanything_spark.operators import multimodal as mm

    w, h, n_frames, vec, real, reason = mm._decode_asset(_float_wav())
    assert real is False
    assert reason == "Error"  # wave.Error's class name
    assert vec.shape == (mm.EMBED_DIM,)


def test_truncated_container_degrades_to_stub():
    """IndexError from a truncated container payload is a payload
    problem, not a codec bug — per-item stub."""
    from embedanything_spark.operators import multimodal as mm

    # RIFF/WAVE magic but truncated before any chunk structure
    payload = b"RIFF\x04\x00\x00\x00WAVE"
    w, h, n_frames, vec, real, reason = mm._decode_asset(payload)
    assert real is False
    assert vec.shape == (mm.EMBED_DIM,)


def test_systemic_memoryerror_still_propagates(monkeypatch):
    """The widened _CODEC_ERRORS tuple must not absorb systemic
    failures."""
    from embedanything_spark import mediacodecs as mc
    from embedanything_spark.operators import multimodal as mm

    def boom(content):
        raise MemoryError("absurd frame buffer")

    monkeypatch.setattr(mm.mc, "decode_png", boom)
    with pytest.raises(MemoryError):
        mm._decode_asset(mc.PNG_SIG + b"\x00" * 40)
