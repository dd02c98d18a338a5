"""Multimodal (binary) column handling: schema, partitioning, and
Arrow-batched UDF plumbing for image/audio/video payloads.

Media decode libraries are not available in this environment, so the decode
kernels are STUBS — either a clearly-marked ``NotImplementedError`` (real
codecs) or a deterministic fake decoder for the synthetic ``FAKEIMG`` format
used by tests.  Everything Spark-side is real and tested: binary columns
travel as ``BinaryType``, batches flow through ``mapInPandas`` (Arrow), and
typed metadata structs come back.

Synthetic binary format (produced by the corpus generator's ``html`` column
and by :func:`fake_image`): ``b"FAKEIMG|<width>|<height>|" + pixel bytes``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta string"
IMAGE_META_SCHEMA = (
    "media_id long, width int, height int, n_bytes int, mean_pixel double, ok boolean"
)


def fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic synthetic image payload."""
    header = f"FAKEIMG|{width}|{height}|".encode()
    body = bytes(((media_id + i) * 31) % 256 for i in range(width * height))
    return header + body


def decode_image_meta(media: DataFrame, id_col: str = "media_id",
                      payload_col: str = "payload") -> DataFrame:
    """Decode image metadata + cheap features from binary payloads.

    Real-codec path is stubbed; the FAKEIMG path exercises the full Spark
    plumbing (binary Arrow transfer, per-batch numpy work, typed struct out).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload) if payload is not None else b""
                if buf.startswith(b"FAKEIMG|"):
                    _, w, h, body = buf.split(b"|", 3)
                    pixels = np.frombuffer(body, dtype=np.uint8)
                    rows.append(
                        (int(mid), int(w), int(h), len(buf),
                         float(pixels.mean()) if pixels.size else 0.0, True)
                    )
                elif buf[:2] == b"\xff\xd8" or buf[:8] == b"\x89PNG\r\n\x1a\n":
                    # real JPEG/PNG: decoding requires Pillow/libjpeg —
                    # unavailable here by design
                    raise NotImplementedError(
                        "real image codecs are not available in this environment"
                    )
                else:
                    rows.append((int(mid), 0, 0, len(buf), 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes", "mean_pixel", "ok"],
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel placeholder — the distributed shape (mapInPandas over
    bucketed payloads, binary out) is the part this engine owns; the pixel
    math needs a codec library."""
    raise NotImplementedError(
        "resize requires an image library not present in this environment; "
        "the decode/metadata path (decode_image_meta) demonstrates the plumbing"
    )


def frame_sample_stub(media: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling placeholder (same rationale as resize_stub)."""
    raise NotImplementedError(
        "video codecs are not available in this environment"
    )


AUDIO_META_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, duration_s double, "
    "rms double, ok boolean"
)


def fake_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic synthetic audio payload: ``FAKEAUD|<rate>|`` + one
    unsigned byte per sample."""
    header = f"FAKEAUD|{sample_rate}|".encode()
    body = bytes(((media_id * 7 + i * 13) % 256) for i in range(n_samples))
    return header + body


def extract_audio_features(media: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    """Audio feature extraction over binary payloads (duration, RMS).

    Same contract as :func:`decode_image_meta`: the FAKEAUD path exercises
    the full distributed plumbing (binary Arrow batches in, vectorized numpy
    per batch, typed rows out); real codecs (WAV/MP3 headers) raise a
    clearly-marked NotImplementedError.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload) if payload is not None else b""
                if buf.startswith(b"FAKEAUD|"):
                    _, rate, body = buf.split(b"|", 2)
                    rate = int(rate)
                    samples = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                    samples = (samples - 128.0) / 128.0
                    rms = float(np.sqrt((samples ** 2).mean())) if samples.size else 0.0
                    rows.append(
                        (int(mid), rate, samples.size,
                         samples.size / rate if rate else 0.0, round(rms, 6), True)
                    )
                elif buf[:4] == b"RIFF" or buf[:3] == b"ID3":
                    raise NotImplementedError(
                        "real audio codecs are not available in this environment"
                    )
                else:
                    rows.append((int(mid), 0, 0, 0.0, 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "duration_s",
                         "rms", "ok"],
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=AUDIO_META_SCHEMA)
