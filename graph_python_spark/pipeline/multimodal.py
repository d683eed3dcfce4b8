"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-aware batching, Arrow UDF
signatures) is real and tested; the actual codec work is STUBBED — the
image/audio libraries are not in this container — behind
``set_decoder``/deterministic fakes, clearly marked.

Pattern: ``mapInPandas`` over an iterator of Arrow batches so each Python
worker touches a bounded batch (spark.sql.execution.arrow.maxRecordsPerBatch
controls peak memory), never a per-row UDF.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

# pluggable real decoder; None -> deterministic fake (see _fake_decode)
_DECODER: Optional[Callable[[bytes, str], list[float]]] = None


def set_decoder(fn: Callable[[bytes, str], list[float]]) -> None:
    """Install a real codec (e.g. PIL/librosa) when available."""
    global _DECODER
    _DECODER = fn


def decode_ppm(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Pure-stdlib decoder for binary PPM/PGM images (P6 = RGB, P5 =
    grayscale — the netpbm formats every codec-free toolchain can emit).
    Returns (width, height, n_channels, samples) with samples the raw
    pixel bytes row-major.  Raises ValueError on anything else — this is
    a REAL decoder for a real format, not a fake."""
    if payload is None or payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                       # single whitespace after maxval
    width, height, maxval = fields
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported maxval {maxval}")
    nch = 3 if payload[:2] == b"P6" else 1
    need = width * height * nch
    data = payload[pos:pos + need]
    if len(data) != need:
        raise ValueError(f"truncated pixel data: {len(data)} != {need}")
    return width, height, nch, list(data)


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib decoder for RIFF/WAVE PCM audio via the ``wave`` +
    ``audioop``-free path: returns (sample_rate, n_channels, samples)
    with 16-bit signed (or 8-bit unsigned rebased) PCM samples
    interleaved.  Raises on compressed/float WAV."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    elif sw == 1:
        samples = [b - 128 for b in raw]
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return rate, nch, samples


def ppm_wav_decoder(payload: bytes, kind: str) -> list[float]:
    """A REAL pluggable decoder for :func:`set_decoder`: P6/P5 netpbm
    images and PCM WAV audio, both parsed with the stdlib only (this
    container has no codec libraries; these formats need none).  Emits
    the 8-dim feature contract of :func:`extract_features`:

      image: [width, height, n_channels, mean, std, min, max, maxrun]
      audio: [rate, n_channels, n_samples, mean, rms, min, max, zcr]

    (pixel stats over 0..255 bytes normalized /255; sample stats over
    the PCM range normalized /32768).  Unknown payloads raise — decode
    failures should surface, not silently featurize garbage."""
    import math

    if kind == "image":
        width, height, nch, px = decode_ppm(payload)
        if not px:       # width or height 0: a valid but empty raster
            return [float(width), float(height), float(nch),
                    0.0, 0.0, 0.0, 0.0, 0.0]
        n = len(px)
        mean = sum(px) / n
        var = sum((p - mean) ** 2 for p in px) / n
        run = best = 1
        for a, b in zip(px, px[1:]):
            run = run + 1 if a == b else 1
            best = max(best, run)
        return [float(width), float(height), float(nch), mean / 255.0,
                math.sqrt(var) / 255.0, min(px) / 255.0, max(px) / 255.0,
                float(best)]
    if kind == "audio":
        rate, nch, s = decode_wav(payload)
        if not s:        # zero-frame PCM: wave.open accepts it
            return [float(rate), float(nch), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        n = len(s)
        mean = sum(s) / n
        rms = math.sqrt(sum(x * x for x in s) / n)
        zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
        return [float(rate), float(nch), float(len(s)), mean / 32768.0,
                rms / 32768.0, min(s) / 32768.0, max(s) / 32768.0,
                zc / max(1, n - 1)]
    raise ValueError(f"no stdlib codec for kind={kind!r}")


def _fake_decode(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: byte histogram moments.

    NOT a real decode — marked stub. Real deployments call set_decoder().
    """
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    acc = [0.0] * dim
    for idx, byte in enumerate(payload):
        acc[idx % dim] += byte / 255.0
    total = max(1.0, float(len(payload)))
    return [a / total * dim for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media -> (media_id, kind, feature: array<double>, n_bytes).

    mapInPandas: batches stream through the Python worker via Arrow; the
    payload column is dropped immediately after featurization so the wide
    binary never reaches the shuffle.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ])

    decoder = _DECODER

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if decoder is not None:
                    feats.append(decoder(payload, kind))  # pragma: no cover
                else:
                    feats.append(_fake_decode(payload, kind, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                "feature": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(featurize, out_schema)


# pluggable real resizer (e.g. PIL: decode -> resize -> re-encode); None ->
# deterministic fake byte-resampler (see _fake_resize)
_RESIZER: Optional[Callable[[bytes, int, int], bytes]] = None


def set_resizer(fn: Callable[[bytes, int, int], bytes]) -> None:
    """Install a real image resizer when a codec library is available."""
    global _RESIZER
    _RESIZER = fn


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: nearest-neighbor resample of the raw byte
    stream to width*height bytes.  NOT a real codec — marked stub; real
    deployments call set_resizer().  Keeps the Spark-side plumbing (Arrow
    batch in, payload+meta rewrite, Arrow batch out) fully real/testable."""
    if payload is None or len(payload) == 0:
        return bytes(width * height)
    n_out = width * height
    n_in = len(payload)
    return bytes(payload[(idx * n_in) // n_out] for idx in range(n_out))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize the image payloads to width×height, updating meta.

    Production shape: per-batch Arrow transform rewriting payload + meta in
    the Python worker (mapInPandas), non-image rows passed through
    untouched.  The codec itself is pluggable via set_resizer(); without
    one the deterministic _fake_resize stand-in runs (codec libraries are
    absent in this environment).
    """
    out_schema = media.schema
    resizer = _RESIZER or _fake_resize

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                payloads.append(resizer(payload, width, height))
                new_meta = dict(meta) if meta is not None else {}
                new_meta["width"] = width
                new_meta["height"] = height
                metas.append(new_meta)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(do_resize, out_schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling metadata plan: computes sampled frame indices
    from meta.n_frames JVM-side; actual frame extraction is the stubbed
    decode step."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                       F.lit(every_n)).alias("frame_indices"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded bytes from id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for m in range(n):
        kind = kinds[m % 3]
        payload = bytes([(m * 37 + idx * 11) % 256 for idx in range((m % 13 + 1) * 16)])
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 48 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 120 if kind == "video" else None,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        }
        rows.append((m, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
