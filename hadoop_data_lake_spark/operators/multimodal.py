"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The container has no media libraries, so the actual codec step is stubbed —
but everything Spark-side is real and tested: the schema contract, the
mapInPandas batch plumbing (Arrow in/out), the partitioning, and the
deterministic fallback decoder used by tests/oracles.

Contract for a media table:
    media_id long, media binary, meta struct<format string, width int,
    height int, n_bytes long>

`extract_features` runs over mapInPandas so each Arrow batch of binary blobs
is processed vectorized in one Python hop; at 100 TB you repartition the
input so batches are memory-bounded (maxRecordsPerBatch) and the decode cost
parallelizes across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, byte_sum long, first_byte int, last_byte int, "
    "byte_mean double"
)


def synth_media_from_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media: UTF-8 bytes of the text as the binary blob,
    with honest metadata. Stands in for an image/audio ingest in tests."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        blob.alias("media"),
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(blob: bytes, fmt: str) -> bytes:
    """Real codec hook. Codec-swap contract:

    - input: raw container bytes + a MIME-ish format hint
      ("image/png", "audio/wav", "fake/utf8", ...);
    - output: canonical decoded bytes — images: RGB raster, row-major,
      8-bit (w*h*3 bytes); audio: mono PCM16LE — so every downstream
      byte-level feature (extract_features) is codec-agnostic;
    - must be a pure function of (blob, fmt): it runs inside Arrow batches
      on executors — no driver state, no filesystem side effects.

    Image decoding is implemented via PIL and activates automatically when
    Pillow is importable; this container ships no media libs, so here the
    call raises NotImplementedError — tests/test_streaming_multimodal.py
    carries both a skipif(no-PIL) real-path test and an assertion on this
    error, making "stub by environment" distinguishable from "stub by
    omission". `_fake_decode` is the deterministic stand-in tests exercise
    unconditionally.
    """
    if fmt.startswith("image/"):
        try:
            from PIL import Image  # noqa: PLC0415 — optional, executor-side
        except ImportError as exc:
            raise NotImplementedError(
                "image codec (Pillow) is not installed in this environment; "
                "use fake_decode=True for the deterministic stand-in"
            ) from exc
        import io as _io

        return Image.open(_io.BytesIO(blob)).convert("RGB").tobytes()
    raise NotImplementedError(
        f"no codec for format {fmt!r} (audio/video codecs are not installed "
        "in this environment); use fake_decode=True for the stand-in"
    )


def _fake_decode(blob: bytes) -> bytes:
    """Deterministic stand-in 'decode': identity over the raw bytes."""
    return blob


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-blob features via Arrow-batched mapInPandas (no per-row serde).

    With a real codec this is where resize/frame-sample/spectrogram go; the
    byte statistics below are the deterministic test surface.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake_decode:
                decoded = pdf["media"].map(lambda b: _fake_decode(bytes(b)))
            else:
                decoded = pd.Series(
                    [
                        decode_media(bytes(b), f)
                        for b, f in zip(pdf["media"], pdf["fmt"])
                    ],
                    index=pdf.index,
                )
            n_bytes = decoded.map(len)
            byte_sum = decoded.map(lambda b: int(sum(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "first_byte": decoded.map(lambda b: b[0] if b else -1).astype("int32"),
                    "last_byte": decoded.map(lambda b: b[-1] if b else -1).astype("int32"),
                    "byte_mean": (byte_sum / n_bytes.clip(lower=1)).astype("float64"),
                }
            )

    fmt_col = (
        F.col("meta.format") if "meta" in media.columns else F.lit("application/octet-stream")
    )
    return media.select("media_id", "media", fmt_col.alias("fmt")).mapInPandas(
        op, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "media_id long, media binary, meta struct<format string, width int, "
    "height int, n_bytes long>"
)


def resize_media(media: DataFrame, target_w: int, target_h: int, fake_decode: bool = True) -> DataFrame:
    """Resize stub over mapInPandas: with a real codec this is
    decode -> resample -> re-encode per Arrow batch. The deterministic fake
    'resize' keeps every byte position j*len/target (nearest-neighbor over
    the raw bytes) so tests pin exact outputs; the Spark-side contract —
    schema, metadata update, Arrow batch shape — is the real thing.
    """
    n_out = max(1, target_w * target_h)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real image codecs (PIL) are not installed; use fake_decode=True"
                )

            def fake_resize(b: bytes) -> bytes:
                b = bytes(b)
                if not b:
                    return b
                step = len(b) / n_out
                return bytes(b[min(int(j * step), len(b) - 1)] for j in range(n_out))

            out = pdf["media"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media": out,
                    "meta": [
                        {
                            "format": "fake/resized",
                            "width": target_w,
                            "height": target_h,
                            "n_bytes": len(b),
                        }
                        for b in out
                    ],
                }
            )

    return media.select("media_id", "media").mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame binary, n_bytes long"


def sample_frames(media: DataFrame, n_frames: int = 4, fake_decode: bool = True) -> DataFrame:
    """Frame-sampling stub over mapInPandas (1 input row -> n output rows —
    the mapInPandas contract allows changing cardinality, which is why this
    is not a scalar pandas UDF). With a real demuxer this is
    open container -> seek n evenly spaced keyframes; the fake splits the
    blob into n contiguous chunks."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real video demuxers (av) are not installed; use fake_decode=True"
                )
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                b = bytes(blob)
                step = max(1, len(b) // n_frames)
                for j in range(n_frames):
                    chunk = b[j * step : (j + 1) * step] if b else b""
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "n_bytes": pd.Series([len(f) for f in frames], dtype="int64"),
                }
            )

    return media.select("media_id", "media").mapInPandas(op, schema=FRAME_SCHEMA)
