"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

All three modalities have REAL, zero-dependency container codecs: PPM (P6)
and 24-bit BMP for images, RIFF/WAVE PCM16 for audio, RIFF/AVI raw-frame
for video — each a genuine parse-the-container path (header scan, chunk
walk, raster/PCM/frame normalization) exercised by oracle-verified registry
queries (media_ppm_decode_stats / media_wav_decode_stats /
media_avi_frame_stats). Only COMPRESSED formats (PNG/JPEG via PIL,
MP3/H.264) are environment-gated behind NotImplementedError; the
deterministic `_fake_decode` stand-in remains for byte-level oracle tests.
Everything Spark-side — schema contract, Arrow mapInPandas/mapInArrow batch
plumbing, partitioning — is identical between the real and fake paths.

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


def decode_ppm(blob: bytes) -> tuple[int, int, bytes]:
    """Pure-Python P6 (binary PPM) decoder: (width, height, RGB raster).

    PPM is a real, fully specified image container (netpbm); the decoder
    needs no media libraries, so the REAL codec path — parse a container,
    produce the canonical raster — is exercisable in any environment.
    Handles '#' comments in the header; maxval must be 255 (8-bit)."""
    if blob[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) stream")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # exactly one whitespace byte separates header from raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    raster = blob[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return w, h, raster


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    """Inverse of decode_ppm — used by the real-path resize re-encode."""
    if len(rgb) != w * h * 3:
        raise ValueError("raster size does not match dimensions")
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """Pure-Python 24-bit uncompressed BMP decoder: (width, height, RGB
    raster, top-down row order). BMP stores rows bottom-up, BGR, with each
    row padded to 4 bytes — all normalized away here so the output matches
    the decode_media canonical-raster contract."""
    import struct

    if blob[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (pix_off,) = struct.unpack_from("<I", blob, 10)
    w, h = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = pix_off + src_row * row_stride
        for x in range(w):
            b, g, r = blob[base + 3 * x : base + 3 * x + 3]
            dst = (row * w + x) * 3
            out[dst : dst + 3] = bytes((r, g, b))
    return w, h, bytes(out)


def decode_media(blob: bytes, fmt: str) -> bytes:
    """Real codec hook. Codec-swap contract:

    - input: raw container bytes + a MIME-ish format hint
      ("image/x-portable-pixmap", "image/bmp", "image/png", "audio/wav",
      "fake/utf8", ...);
    - output: canonical decoded bytes — images: RGB raster, row-major,
      8-bit (w*h*3 bytes); audio: mono PCM16LE — so every downstream
      byte-level feature (extract_features) is codec-agnostic;
    - must be a pure function of (blob, fmt): it runs inside Arrow batches
      on executors — no driver state, no filesystem side effects.

    PPM (P6) and 24-bit BMP decode via the pure-Python parsers above in any
    environment — the real container-to-raster path with zero dependencies.
    Compressed formats (PNG/JPEG/...) use PIL when importable; this
    container ships no media libs, so those raise NotImplementedError —
    tests/test_streaming_multimodal.py asserts both the working pure-Python
    path and this error, making "stub by environment" distinguishable from
    "stub by omission". `_fake_decode` is the deterministic stand-in the
    byte-level oracles replay.
    """
    if fmt in ("image/x-portable-pixmap", "image/ppm"):
        return decode_ppm(blob)[2]
    if fmt == "image/bmp":
        return decode_bmp(blob)[2]
    if fmt.startswith("image/"):
        try:
            from PIL import Image  # noqa: PLC0415 — optional, executor-side
        except ImportError as exc:
            raise NotImplementedError(
                f"compressed image codec for {fmt!r} needs Pillow, which is "
                "not installed in this environment; use PPM/BMP blobs or "
                "fake_decode=True for the deterministic stand-in"
            ) from exc
        import io as _io

        return Image.open(_io.BytesIO(blob)).convert("RGB").tobytes()
    if fmt in ("audio/wav", "audio/x-wav"):
        return decode_wav(blob)[2]
    raise NotImplementedError(
        f"no codec for format {fmt!r} (compressed audio/video codecs are "
        "not installed in this environment); use fake_decode=True for the "
        "stand-in"
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
    """Resize over mapInPandas.

    fake_decode=True (the oracle-replayed surface): the deterministic fake
    'resize' keeps every byte position j*len/target — nearest-neighbor over
    the raw bytes, so tests/SQL pin exact outputs.

    fake_decode=False: the REAL path — decode the container (pure-Python
    PPM/BMP, see decode_media), 2-D nearest-neighbor resample of the RGB
    raster, re-encode as PPM. Runs without media libraries; compressed
    inputs raise NotImplementedError where PIL is absent.
    """
    n_out = max(1, target_w * target_h)

    def _real_resize(blob: bytes, fmt: str) -> bytes:
        if fmt in ("image/x-portable-pixmap", "image/ppm"):
            w, h, raster = decode_ppm(bytes(blob))
        elif fmt == "image/bmp":
            w, h, raster = decode_bmp(bytes(blob))
        else:  # delegate (raises NotImplementedError without PIL)
            raise NotImplementedError(
                f"real resize supports PPM/BMP containers here; got {fmt!r}"
            )
        out = bytearray(target_w * target_h * 3)
        for y in range(target_h):
            sy = min(y * h // target_h, h - 1)
            for x in range(target_w):
                sx = min(x * w // target_w, w - 1)
                src = (sy * w + sx) * 3
                dst = (y * target_w + x) * 3
                out[dst : dst + 3] = raster[src : src + 3]
        return encode_ppm(target_w, target_h, bytes(out))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake_decode:

                def fake_resize(b: bytes) -> bytes:
                    b = bytes(b)
                    if not b:
                        return b
                    step = len(b) / n_out
                    return bytes(b[min(int(j * step), len(b) - 1)] for j in range(n_out))

                out = pdf["media"].map(fake_resize)
                out_fmt = "fake/resized"
            else:
                out = pd.Series(
                    [
                        _real_resize(b, f)
                        for b, f in zip(pdf["media"], pdf["fmt"])
                    ],
                    index=pdf.index,
                )
                out_fmt = "image/x-portable-pixmap"
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media": out,
                    "meta": [
                        {
                            "format": out_fmt,
                            "width": target_w,
                            "height": target_h,
                            "n_bytes": len(b),
                        }
                        for b in out
                    ],
                }
            )

    fmt_col = (
        F.col("meta.format") if "meta" in media.columns else F.lit("application/octet-stream")
    )
    return media.select("media_id", "media", fmt_col.alias("fmt")).mapInPandas(
        op, schema=RESIZE_SCHEMA
    )


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


def arrow_byte_entropy(media: DataFrame) -> DataFrame:
    """Per-blob byte-value Shannon entropy via mapInArrow — the zero-copy
    tier below mapInPandas: the operator consumes pyarrow RecordBatches
    directly (no pandas materialization), runs one numpy bincount +
    log-sum per blob, and emits arrow batches back. For byte-level media
    statistics (corruption screens, compressibility estimates) this is
    the right shape at 100 TB: Arrow stays columnar end to end and the
    Python step is pure vectorized math.

    Entropy uses the log-sum identity H = log2(N) - (1/N) * sum c_i*log2(c_i)
    with counts ascending by byte value — a deterministic summation order,
    so the float result replays externally (rounding at the query layer).
    """
    import math

    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("byte_entropy", DoubleType()),
        ]
    )

    def op(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("media").to_pylist()
            n_out, h_out = [], []
            for b in blobs:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = arr.size
                n_out.append(int(n))
                if n == 0:
                    h_out.append(0.0)
                    continue
                counts = np.bincount(arr, minlength=256)
                # strict left-to-right fold in ascending byte order: numpy
                # dot/sum use pairwise accumulation, which an external
                # engine cannot replay bit-for-bit; the sequential fold
                # matches DuckDB's ordered list_reduce exactly.
                acc = 0.0
                for c in counts[counts > 0].tolist():
                    acc += c * math.log2(c)
                h_out.append(float(math.log2(n) - acc / n))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(n_out, type=pa.int64()),
                    pa.array(h_out, type=pa.float64()),
                ],
                names=["media_id", "n_bytes", "byte_entropy"],
            )

    return media.select("media_id", "media").mapInArrow(op, schema)


PHASH_SCHEMA = "media_id long, phash long, n_bytes long"

#: 60-bit perceptual hash: 61 byte-sum segments -> 60 gradient-sign bits.
PHASH_BITS = 60


def perceptual_hash(media: DataFrame) -> DataFrame:
    """1-D difference hash (dHash) over opaque media blobs: (media_id,
    phash bigint, n_bytes).

    The classic image dHash downsamples to a (w+1) x h grayscale grid and
    emits one bit per horizontal gradient sign. Applied to an opaque byte
    stream the same construction is: split the blob into 61 near-equal
    segments (boundaries floor(k * L / 61) — the exact integer grid
    downsample), take each segment's byte sum as the "pixel", and emit
    bit_k = (sum_k > sum_{k+1}) for k = 0..59, packed MSB-first into a
    60-bit bigint (the repo's md5_60bit convention: stays clear of the
    int64 sign bit in every engine).

    Integer-exact end to end => bit-for-bit replayable by an external SQL
    engine (ord/substr segment sums), while the Spark side runs the real
    multimodal plumbing: Arrow-batched mapInArrow over the binary column,
    one Python hop, numpy cumsum per blob — no per-row serde.

    Near-dup property: byte-local edits move one or two segment sums, so
    hamming(phash_a, phash_b) <= 2-3 for same-length perturbed copies,
    while unrelated blobs land ~30 bits apart.
    """
    import math  # noqa: F401  (parallel to arrow_byte_entropy imports)

    import numpy as np
    import pyarrow as pa

    segs = PHASH_BITS + 1

    def op(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("media").to_pylist()
            n_out, h_out = [], []
            for b in blobs:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = int(arr.size)
                n_out.append(n)
                cs = np.concatenate([[0], np.cumsum(arr, dtype=np.int64)])
                bounds = (np.arange(segs + 1, dtype=np.int64) * n) // segs
                sums = cs[bounds[1:]] - cs[bounds[:-1]]
                bits = sums[:-1] > sums[1:]
                h = 0
                for k in range(PHASH_BITS):
                    if bits[k]:
                        h |= 1 << (PHASH_BITS - 1 - k)
                h_out.append(h)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(h_out, type=pa.int64()),
                    pa.array(n_out, type=pa.int64()),
                ],
                names=["media_id", "phash", "n_bytes"],
            )

    return media.select("media_id", "media").mapInArrow(op, PHASH_SCHEMA)


def phash_near_dup_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash hamming distance.

    Candidate generation is the SimHash pigeonhole banding (dedup.py
    simhash_pairs): split the 60-bit hash into `chunks` equal chunks; any
    pair within `max_hamming` flips (max_hamming < chunks) leaves at least
    one chunk untouched, so an equi-join on (chunk_idx, chunk_value) finds
    EVERY qualifying pair — banded output == exact all-pairs output, with
    shuffle O(n x chunks) instead of an O(n^2) theta join. Verification is
    exact: bit_count(xor) <= max_hamming.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    assert max_hamming < chunks, "pigeonhole guarantee needs flips < chunks"
    width = PHASH_BITS // chunks
    mask = (1 << width) - 1
    chunked = hashed.select(
        F.col("media_id"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        (
                            F.shiftright(F.col("phash"), c * width)
                            .bitwiseAND(F.lit(mask))
                        ).alias("ck"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ch"),
    ).select("media_id", "phash", F.col("ch.c").alias("c"), F.col("ch.ck").alias("ck"))
    a = chunked.select(
        F.col("media_id").alias("id_a"), F.col("phash").alias("ph_a"), "c", "ck"
    )
    b = chunked.select(
        F.col("media_id").alias("id_b"), F.col("phash").alias("ph_b"), "c", "ck"
    )
    return (
        a.join(b, ["c", "ck"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.expr("ph_a ^ ph_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


CHANNEL_STATS_SCHEMA = (
    "media_id long, width int, height int, r_sum long, g_sum long, b_sum long"
)


def decode_channel_stats(media: DataFrame, fmt: str) -> DataFrame:
    """REAL-codec feature extraction: parse each blob with the actual
    container decoder (decode_media — PPM/BMP pure-Python parsers, PIL for
    compressed formats where installed), then reduce the canonical RGB
    raster to integer per-channel sums. Unlike extract_features'
    fake-decode default, this path exercises header parsing, raster
    normalization, and the codec-swap contract inside Arrow batches — and
    stays integer-exact, so an external SQL engine can replay it from the
    source bytes."""
    import numpy as np
    import pyarrow as pa

    def op(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("media").to_pylist()
            w_o, h_o, r_o, g_o, b_o = [], [], [], [], []
            for blob in blobs:
                b = bytes(blob)
                if fmt in ("image/x-portable-pixmap", "image/ppm"):
                    w, h, raster = decode_ppm(b)
                elif fmt == "image/bmp":
                    w, h, raster = decode_bmp(b)
                else:
                    raster = decode_media(b, fmt)
                    w, h = len(raster) // 3, 1
                arr = np.frombuffer(raster, dtype=np.uint8).reshape(-1, 3)
                w_o.append(int(w))
                h_o.append(int(h))
                sums = arr.sum(axis=0, dtype=np.int64)
                r_o.append(int(sums[0]))
                g_o.append(int(sums[1]))
                b_o.append(int(sums[2]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(w_o, type=pa.int32()),
                    pa.array(h_o, type=pa.int32()),
                    pa.array(r_o, type=pa.int64()),
                    pa.array(g_o, type=pa.int64()),
                    pa.array(b_o, type=pa.int64()),
                ],
                names=["media_id", "width", "height", "r_sum", "g_sum", "b_sum"],
            )

    return media.select("media_id", "media").mapInArrow(op, CHANNEL_STATS_SCHEMA)


def synth_wav_pcm16(pcm: bytes, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Build a real RIFF/WAVE container around raw PCM16LE bytes — the
    audio-ingest counterpart of encode_ppm."""
    import struct

    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def decode_wav(blob: bytes) -> tuple[int, int, bytes]:
    """Pure-Python RIFF/WAVE parser: (channels, sample_rate, PCM16LE bytes).

    Walks the chunk list properly (fmt/data may be preceded by LIST/fact
    chunks in real files); only uncompressed PCM16 is supported — the same
    zero-dependency real-container contract as decode_ppm/decode_bmp."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, channels, rate, pcm = 12, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only uncompressed PCM16 WAV supported")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return channels, rate, pcm


AUDIO_STATS_SCHEMA = (
    "media_id long, n_samples long, sample_sum long, sample_min int, sample_max int"
)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode: parse each blob's RIFF/WAVE container
    (decode_wav) inside Arrow batches and reduce the PCM16LE samples to
    integer stats — the audio twin of decode_channel_stats; replayable
    from source bytes by an external engine."""
    import numpy as np
    import pyarrow as pa

    def op(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("media").to_pylist()
            n_o, s_o, mn_o, mx_o = [], [], [], []
            for blob in blobs:
                _, _, pcm = decode_wav(bytes(blob))
                arr = np.frombuffer(pcm, dtype="<i2")
                n_o.append(int(arr.size))
                s_o.append(int(arr.sum(dtype=np.int64)))
                mn_o.append(int(arr.min()) if arr.size else 0)
                mx_o.append(int(arr.max()) if arr.size else 0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(n_o, type=pa.int64()),
                    pa.array(s_o, type=pa.int64()),
                    pa.array(mn_o, type=pa.int32()),
                    pa.array(mx_o, type=pa.int32()),
                ],
                names=["media_id", "n_samples", "sample_sum", "sample_min", "sample_max"],
            )

    return media.select("media_id", "media").mapInArrow(op, AUDIO_STATS_SCHEMA)


def synth_avi_raw(frames: list, width: int = 0, height: int = 0) -> bytes:
    """Build a structurally valid minimal AVI: RIFF 'AVI ' -> LIST hdrl
    (avih main header with the real dwTotalFrames/dwWidth/dwHeight) ->
    LIST movi with one uncompressed '00db' chunk per frame (word-aligned).
    The video-ingest counterpart of encode_ppm/synth_wav_pcm16."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        40_000,  # dwMicroSecPerFrame (25 fps)
        0, 0, 0,
        len(frames),  # dwTotalFrames
        0, 1,  # dwStreams
        0,
        width, height,
        0, 0, 0, 0,
    )
    hdrl = b"hdrl" + chunk(b"avih", avih)
    movi = b"movi" + b"".join(chunk(b"00db", bytes(f)) for f in frames)
    body = chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def decode_avi(blob: bytes) -> tuple[int, list]:
    """Pure-Python AVI parser: (declared frame count, list of raw frame
    byte-strings). Walks the RIFF chunk tree — hdrl/avih for the declared
    dwTotalFrames, LIST movi for the '00db'/'00dc' frame chunks
    (word-aligned) — the same zero-dependency real-container contract as
    decode_ppm/decode_wav."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    declared = None
    frames: list = []

    def walk(start: int, end: int) -> None:
        nonlocal declared
        pos = start
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                list_type = blob[body_start : body_start + 4]
                if list_type in (b"hdrl", b"movi"):
                    walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                declared = struct.unpack_from("<I", blob, body_start + 16)[0]
            elif cid in (b"00db", b"00dc"):
                frames.append(blob[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    walk(12, len(blob))
    if declared is None:
        raise ValueError("missing avih header")
    return declared, frames


AVI_FRAME_SCHEMA = "media_id long, frame_idx int, n_bytes long, byte_sum long"


def avi_frame_stats(media: DataFrame, every: int = 2) -> DataFrame:
    """REAL video frame sampling: parse each blob's AVI container
    (decode_avi), keep every `every`-th frame, reduce each kept frame to
    integer byte stats — the real-container upgrade of the fake-codec
    sample_frames, same Arrow mapInArrow shape, replayable from source
    bytes."""
    import pyarrow as pa

    def op(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            blobs = batch.column("media").to_pylist()
            o_id, o_idx, o_n, o_s = [], [], [], []
            for mid, blob in zip(ids, blobs):
                declared, frames = decode_avi(bytes(blob))
                if declared != len(frames):
                    raise ValueError(
                        f"frame count mismatch: avih declares {declared}, "
                        f"movi holds {len(frames)}"
                    )
                for idx in range(0, len(frames), every):
                    f = frames[idx]
                    o_id.append(mid)
                    o_idx.append(idx)
                    o_n.append(len(f))
                    o_s.append(int(sum(f)))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=pa.int64()),
                    pa.array(o_idx, type=pa.int32()),
                    pa.array(o_n, type=pa.int64()),
                    pa.array(o_s, type=pa.int64()),
                ],
                names=["media_id", "frame_idx", "n_bytes", "byte_sum"],
            )

    return media.select("media_id", "media").mapInArrow(op, AVI_FRAME_SCHEMA)
