"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via vectorized Arrow batches.

The image/audio decode libraries are not in this container, so the
decode step is STUBBED behind an import-try (a deterministic fake
feature extractor runs instead, clearly marked).  Everything
Spark-side — schema, batch shape, partitioning, failure isolation —
is real and tested; swapping the stub for PIL/librosa at deploy time
changes only `_decode_image_real`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff",  # wav/avi container
    b"ID3": "mp3",
}


def sniff_media(payload: bytes) -> str:
    if payload is None:
        return "unknown"
    for magic, kind in MAGIC.items():
        if payload[: len(magic)] == magic:
            return kind
    return "unknown"


def _decode_image_real(payload: bytes):  # pragma: no cover - needs PIL
    from PIL import Image  # type: ignore
    import io

    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, img.mode


def _decode_stub(payload: bytes):
    """Deterministic fake decode: dimensions derived from the content
    hash.  NOT a real decoder — stands in for PIL/librosa so the batch
    plumbing is exercisable in this sandbox."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 640, 16 + h[1] % 480, "STUB"


def _feature_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    try:
        from PIL import Image  # noqa: F401  # type: ignore

        decode = _decode_image_real
    except ImportError:
        decode = _decode_stub

    for batch in batches:
        names = batch.schema.names
        ids = batch.column(names.index("media_id")).to_pylist()
        payloads = batch.column(names.index("payload")).to_pylist()
        kind, width, height, mode, nbytes, digest, status = \
            [], [], [], [], [], [], []
        for payload in payloads:
            k = sniff_media(payload)
            kind.append(k)
            nbytes.append(len(payload) if payload is not None else 0)
            digest.append(
                hashlib.md5(payload).hexdigest() if payload is not None else None
            )
            if payload is None:
                width.append(None); height.append(None); mode.append(None)
                status.append("failed")
                continue
            try:
                w, h, m = decode(payload)
                width.append(w); height.append(h); mode.append(m)
                status.append("ok")
            except Exception:  # failure isolation
                width.append(None); height.append(None); mode.append(None)
                status.append("failed")
        yield pa.RecordBatch.from_pydict({
            "media_id": pa.array(ids),
            "kind": pa.array(kind, type=pa.string()),
            "width": pa.array(width, type=pa.int32()),
            "height": pa.array(height, type=pa.int32()),
            "mode": pa.array(mode, type=pa.string()),
            "payload_bytes": pa.array(nbytes, type=pa.int64()),
            "payload_md5": pa.array(digest, type=pa.string()),
            "status": pa.array(status, type=pa.string()),
        })


def extract_media_features(df: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    """(media_id, payload:binary) -> typed metadata row per asset."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(payload_col).alias("payload"))
    return src.mapInArrow(
        _feature_batches,
        "media_id long, kind string, width int, height int, mode string, "
        "payload_bytes long, payload_md5 string, status string",
    )
