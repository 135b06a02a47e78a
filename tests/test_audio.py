"""MM5 audio fingerprint dedup: real WAV decode, amplitude-invariant
band-energy fingerprints, inverted-index pairing vs a brute-force
definition mirror."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from map_reduce_sf_crime_spark.operators import audio


def _wav(samples: np.ndarray, rate: int = 8000, n_ch: int = 1) -> bytes:
    pcm = np.clip(np.round(samples * 32767), -32768, 32767).astype("<i2")
    if n_ch == 2:
        pcm = np.repeat(pcm, 2)
    data = pcm.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _tone(freqs, n=8000, rate=8000, seed=None):
    t = np.arange(n) / rate
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs) / (len(freqs) + 1)
    if seed is not None:
        x = x + np.random.default_rng(seed).normal(0, 0.01, n)
    return x


def test_decode_wav_roundtrip_and_downmix():
    x = _tone([440.0])
    rate, got = audio.decode_wav(_wav(x))
    assert rate == 8000 and len(got) == len(x)
    assert float(np.abs(got - x).max()) < 2 / 32768
    # stereo downmixes to the same mono signal
    _, stereo = audio.decode_wav(_wav(x, n_ch=2))
    assert float(np.abs(stereo - got).max()) < 2 / 32768
    with pytest.raises(ValueError, match="RIFF"):
        audio.decode_wav(b"\x00" * 64)
    bad = bytearray(_wav(x))
    bad[20] = 3  # IEEE float fmt code
    with pytest.raises(ValueError, match="16-bit PCM"):
        audio.decode_wav(bytes(bad))


def test_fingerprint_amplitude_invariance():
    """Sign-of-difference-of-differences: scaling the signal scales
    every band energy by c², so sub-fingerprints survive a volume
    change (up to 16-bit requantization noise)."""
    x = _tone([440.0, 1200.0], seed=1)
    _, a = audio.decode_wav(_wav(x))
    _, b = audio.decode_wav(_wav(0.5 * x))
    fa, fb = audio.fingerprint_samples(a), audio.fingerprint_samples(b)
    assert len(fa) == len(fb) > 10
    same = sum(1 for u, v in zip(fa, fb) if u == v)
    assert same / len(fa) >= 0.9
    # different content is far: another tone shares few sub-fps
    _, c = audio.decode_wav(_wav(_tone([700.0, 2100.0], seed=2)))
    fc = audio.fingerprint_samples(c)
    cross = sum(1 for u, v in zip(fa, fc) if u == v)
    assert cross / len(fa) <= 0.3
    # clips below two frames fingerprint empty
    assert audio.fingerprint_samples(np.zeros(100)) == []


def test_audio_near_pairs_matches_brute_force(spark):
    """The inverted-index pairing equals the brute-force aligned
    match-fraction definition over every clip pair, and finds exactly
    the volume-changed twin."""
    clips = {
        0: _tone([440.0, 1200.0], seed=1),
        1: 0.6 * _tone([440.0, 1200.0], seed=1),  # volume twin of 0
        2: _tone([700.0, 2100.0], seed=2),
        3: _tone([300.0], seed=3),
        4: np.zeros(200),  # too short: no frames, never paired
    }
    media = spark.createDataFrame(
        [(k, bytearray(_wav(v))) for k, v in clips.items()],
        "doc_id long, payload binary",
    )
    fps = audio.clip_fingerprints(media)
    rows = {r.doc_id: r.fp for r in fps.collect()}
    assert rows[4] == []
    got = {
        (r.doc_a, r.doc_b): (r.n_match, round(r.match_frac, 6))
        for r in audio.audio_near_pairs(fps, min_match_frac=0.7).collect()
    }
    # brute-force mirror of the definition
    want = {}
    ids = sorted(clips)
    for i in ids:
        for j in ids:
            if i >= j or not rows[i] or not rows[j]:
                continue
            m = sum(1 for u, v in zip(rows[i], rows[j]) if u == v)
            frac = m / min(len(rows[i]), len(rows[j]))
            if frac >= 0.7:
                want[(i, j)] = (m, round(frac, 6))
    assert got == want
    assert (0, 1) in got and all(p == (0, 1) for p in got)


def test_clip_fingerprints_decoder_seam(spark):
    """The decoder is injectable (codec seam): a fake decoder drives
    the same fingerprint/join plumbing."""
    media = spark.createDataFrame(
        [(0, bytearray(b"opaque-bytes-1")), (1, bytearray(b"opaque-bytes-2"))],
        "doc_id long, payload binary",
    )

    def fake(payload: bytes):
        rng = np.random.default_rng(len(payload))
        return 4000, rng.normal(0, 0.2, 4000)

    out = {r.doc_id: r for r in audio.clip_fingerprints(media, decoder=fake).collect()}
    assert out[0].sample_rate == 4000 and out[0].n_frames == len(out[0].fp) > 0
    assert out[0].fp == out[1].fp  # same length -> same fake signal


def test_band_edges_are_log_spaced_and_strictly_increasing():
    """Regression: integer truncation used to collapse the low edges
    at the default parameters, silently degrading the log-band design
    to a linear fallback."""
    edges = audio._band_edges(audio.FRAME_LEN, audio.N_BANDS)
    assert len(edges) == audio.N_BANDS + 1
    assert all(b > a for a, b in zip(edges, edges[1:]))
    # genuinely log-ish: the top band is much wider than the bottom
    assert (edges[-1] - edges[-2]) > 8 * (edges[1] - edges[0])
    with pytest.raises(ValueError, match="too small"):
        audio._band_edges(16, 16)


def test_decode_wav_truncated_fmt_raises_valueerror():
    body = struct.pack("<HH", 1, 1)  # 4-byte fmt stub
    data = b"\x00" * 32
    payload = (
        b"RIFF" + struct.pack("<I", 24 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert len(payload) >= 44  # past the container sanity guard
    with pytest.raises(ValueError, match="fmt chunk truncated"):
        audio.decode_wav(payload)


def test_decode_wav_overrun_data_chunk_raises_valueerror():
    """A data chunk declaring more bytes than the payload carries must
    raise, not silently fingerprint the truncated audio."""
    body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = b"\x00" * 32
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", len(data) + 64) + data
    )
    with pytest.raises(ValueError, match="data chunk declares"):
        audio.decode_wav(payload)


def test_decode_audio_dispatch_and_compressed_raises():
    """decode_audio routes RIFF to decode_wav and raises a
    format-NAMING error for compressed containers — a FLAC clip must
    never be fingerprinted as garbage PCM."""
    body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<4h", 0, 1000, -1000, 0)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, samples = audio.decode_audio(wav)
    assert rate == 8000 and len(samples) == 4
    for payload, fmt in [
        (b"fLaC" + b"\x00" * 64, "FLAC"),
        (b"OggS" + b"\x00" * 64, "Ogg"),
        (b"ID3\x04" + b"\x00" * 64, "MP3"),
        (b"\xff\xfb\x90\x00" + b"\x00" * 64, "MP3"),
    ]:
        with pytest.raises(ValueError, match=fmt):
            audio.decode_audio(payload)
    with pytest.raises(ValueError, match="unrecognized audio container"):
        audio.decode_audio(b"\x00" * 64)


def test_soundfile_decode_wav_parity_when_codec_present():
    """When the optional soundfile library exists, its decode of a
    16-bit PCM WAV must match decode_wav sample-for-sample (the seam's
    parity contract); skipped in codec-less containers."""
    pytest.importorskip("soundfile")
    import numpy as np

    rng = np.random.default_rng(11)
    pcm = (rng.uniform(-0.5, 0.5, 2048) * 32768).astype("<i2")
    body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 2 * len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", 2 * len(pcm)) + pcm.tobytes()
    )
    r1, s1 = audio.decode_wav(wav)
    r2, s2 = audio.soundfile_decode(wav)
    assert r1 == r2
    assert np.allclose(s1, s2, atol=1e-9)
    assert audio.fingerprint_samples(s1) == audio.fingerprint_samples(s2)
