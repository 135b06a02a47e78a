"""Audio fingerprinting and near-dup detection (MM5) — the audio
twin of the image dHash tier (multimodal.image_dhash): a REAL
stdlib-only decode of the one uncompressed format (RIFF/WAVE 16-bit
PCM), a Haitsma–Kalker-style band-energy difference fingerprint
(Haitsma & Kalker 2002, public — the classic robust audio hash), and
candidate pairing through the SAME inverted-index join discipline as
the substring-dup and image tiers: never all-pairs.

The fingerprint: frame the signal (``FRAME_LEN`` samples, ``HOP``
hop), per frame compute energies in ``N_BANDS+1`` log-spaced FFT
bands, and emit one bit per band pair —

    bit(f, b) = [ (E(f,b) − E(f,b+1)) − (E(f−1,b) − E(f−1,b+1)) > 0 ]

Sign-of-difference-of-differences is EXACTLY invariant to amplitude
scaling (every energy scales by c², both differences scale together —
the same closed-form invariance argument as dHash's brightness
shift) and robust to mild noise; per frame the bits pack into one
integer sub-fingerprint.

Scale shape: decoding + FFT is ONE Arrow-batched ``mapInPandas`` pass
(the only Python); matching is JVM-side — clips explode into
(frame_idx, sub_fp) rows, an equi-join on that pair builds candidate
clip pairs from shared sub-fingerprints ONLY (inverted index — cost
tracks matches, not clips²), and the verify aggregate computes the
aligned-frame match fraction. Heavy codecs (mp3/flac) are not in
this image; the decoder seam is injectable exactly like
multimodal.extract_features' — the fingerprint/join plumbing is
codec-agnostic.

No reference counterpart (SURVEY §2.11 MM5).
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_LEN = 1024
HOP = 512
#: 16 bits per frame -> 17 band edges, log-spaced
N_BANDS = 16


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE container with 16-bit PCM samples and return
    ``(sample_rate, mono float64 samples in [-1, 1))``; multi-channel
    input is mean-downmixed. Raises ``ValueError`` on anything else
    (compressed codecs need an injected decoder — the image tier's
    seam policy)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid in (b"fmt ", b"data") and i + 8 + size > len(payload):
            # Silent truncation would fingerprint partial audio; mirror
            # the PGM raster-size check and fail loudly instead.
            raise ValueError(
                f"WAVE {cid.decode('ascii').strip()} chunk declares "
                f"{size} bytes but only {len(payload) - i - 8} remain"
            )
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(
            f"WAVE fmt chunk truncated ({len(fmt)} bytes < 16)"
        )
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM is decoded here (fmt={audio_fmt}, bits={bits});"
            " inject a decoder for compressed audio"
        )
    if n_ch < 1:
        raise ValueError("WAVE with zero channels")
    pcm = np.frombuffer(data[: (len(data) // (2 * n_ch)) * 2 * n_ch], dtype="<i2")
    samples = pcm.reshape(-1, n_ch).mean(axis=1) / 32768.0
    return int(rate), samples.astype(np.float64)


def _band_edges(frame_len: int, n_bands: int) -> list[int]:
    """Log-spaced band edges over the positive spectrum (skip DC),
    rounded then forced STRICTLY increasing — truncation-based
    uniquing silently collapsed the low edges at the default
    parameters (``geomspace(2, 512, 17).astype(int)`` starts
    ``[2, 2, ...]``) and degraded the whole design to a linear
    fallback; the monotonic fix-up keeps every low band intact where
    real audio concentrates its energy."""
    edges: list[int] = []
    prev = 1
    for v in np.geomspace(2, frame_len // 2, n_bands + 1):
        e = max(int(round(v)), prev + 1)
        edges.append(e)
        prev = e
    if edges[-1] > frame_len // 2 + 1:
        raise ValueError(
            f"frame_len {frame_len} too small for {n_bands} bands"
        )
    return edges


def fingerprint_samples(samples: np.ndarray) -> list[int]:
    """Per-frame 16-bit sub-fingerprints (Haitsma–Kalker bit rule over
    log-spaced FFT band energies). Deterministic; clips shorter than
    two frames fingerprint to an empty list."""
    n = len(samples)
    if n < FRAME_LEN + HOP:
        return []
    edges = _band_edges(FRAME_LEN, N_BANDS)
    window = np.hanning(FRAME_LEN)
    prev = None
    out: list[int] = []
    for start in range(0, n - FRAME_LEN + 1, HOP):
        frame = samples[start : start + FRAME_LEN] * window
        mag = np.abs(np.fft.rfft(frame)) ** 2
        e = np.array(
            [mag[edges[b] : edges[b + 1]].sum() for b in range(N_BANDS)]
        )
        # pad one pseudo-band so N_BANDS differences exist
        d = np.diff(np.append(e, 0.0))
        if prev is not None:
            bits = (d - prev) > 0
            out.append(int(sum(1 << i for i, v in enumerate(bits) if v)))
        prev = d
    return out


FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fp", T.ArrayType(T.IntegerType())),
    ]
)


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Format-dispatching decoder for the :func:`clip_fingerprints`
    seam: RIFF/WAVE decodes via :func:`decode_wav`; compressed
    containers are RECOGNIZED by magic and raise a format-specific
    error naming the seam — a FLAC clip must never be silently
    fingerprinted as garbage PCM, and the error tells the operator
    exactly which codec to inject (e.g. :func:`soundfile_decode`)."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    for magic, fmt in ((b"fLaC", "FLAC"), (b"OggS", "Ogg"), (b"ID3", "MP3")):
        if payload[: len(magic)] == magic:
            raise ValueError(
                f"{fmt} payload needs a codec-backed decoder — inject "
                "one into clip_fingerprints (soundfile_decode when the "
                "soundfile library is present)"
            )
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        raise ValueError(
            "MP3 frame-sync payload needs a codec-backed decoder — "
            "inject one into clip_fingerprints (soundfile_decode when "
            "the soundfile library is present)"
        )
    raise ValueError("unrecognized audio container (not RIFF/FLAC/Ogg/MP3)")


def soundfile_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Codec-backed decoder for the same seam: any libsndfile-readable
    container (FLAC/Ogg/WAV/…) → ``(rate, mono float64 samples)``,
    mean-downmixed exactly like :func:`decode_wav`. OPTIONAL
    dependency — raises a clear ImportError when the soundfile
    library is absent (tests skip-if-absent); WAV parity with
    decode_wav is the pinned contract when it is present."""
    import io

    try:
        import soundfile as sf
    except ImportError as e:  # pragma: no cover - codec-less container
        raise ImportError(
            "soundfile_decode needs the soundfile library (pip install "
            "soundfile); in a codec-less environment use decode_wav for "
            "RIFF/WAVE payloads"
        ) from e
    data, rate = sf.read(io.BytesIO(payload), dtype="float64")
    samples = data.mean(axis=1) if data.ndim > 1 else data
    return int(rate), samples.astype(np.float64)


def clip_fingerprints(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, np.ndarray]] = decode_wav,
) -> DataFrame:
    """(doc_id, sample_rate, n_frames, fp) per clip — decode + FFT in
    one Arrow-batched ``mapInPandas`` pass (``decoder`` injectable,
    the codec seam). Expects ``(doc_id, payload)``."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decoder(bytes(payload))
                fp = fingerprint_samples(samples)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "sample_rate": rate,
                        "n_frames": len(fp),
                        "fp": fp,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_frames", "fp"]
            )

    return media.select("doc_id", "payload").mapInPandas(_batches, FP_SCHEMA)


def audio_near_pairs(
    fps: DataFrame, min_match_frac: float = 0.7
) -> DataFrame:
    """Aligned near-duplicate clip pairs from per-frame
    sub-fingerprints: ``(doc_a, doc_b, n_match, match_frac)`` where
    ``match_frac`` = matching aligned frames / the shorter clip's
    frame count. Candidates come ONLY from the (frame_idx, sub_fp)
    equi-join — the inverted-index discipline (a pair with zero
    matching frames is never materialized); the join's group sizes
    are bounded by how many clips share an exact sub-fingerprint at
    the same offset, the output-bound regime of the simhash/dhash
    tiers. Alignment is index-based (clips compared from their
    starts) — offset-search is a documented non-goal, matching the
    lookup-table usage in Haitsma & Kalker. The exploded frame is
    plan-cached: it feeds BOTH sides of the self-join, and uncached
    the upstream Arrow decode+FFT pass would execute once per side
    (the image twin guards its banded self-join the same way)."""
    from ..functions.caching import plan_cache

    ex = fps.select(
        "doc_id",
        "n_frames",
        F.posexplode("fp").alias("frame_idx", "sub_fp"),
    ).transform(plan_cache)
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.frame_idx") == F.col("b.frame_idx"))
            & (F.col("a.sub_fp") == F.col("b.sub_fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.least(F.col("a.n_frames"), F.col("b.n_frames")).alias("_n"),
        )
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_match",
        (F.col("n_match") / F.col("_n")).alias("match_frac"),
    ).filter(F.col("match_frac") >= min_match_frac)
