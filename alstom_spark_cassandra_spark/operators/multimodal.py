"""Multimodal (image/audio/video) column plumbing.

Not in the reference (text/JSON only). Design: media payloads are
opaque `binary` columns travelling next to typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` operators so the Python media libraries see whole
columnar batches, never row-at-a-time serde.

Decode kernels are layered by what the environment can honestly do:
uncompressed formats decode for REAL with the stdlib (`struct` for
24-bit BMP, `wave` for PCM WAV — no external codecs needed, tested
against hand-built files); PIL is auto-detected at import and used
for everything else when present; only when a payload is neither a
known uncompressed format nor PIL-decodable does the deterministic
fake run (compressed codecs are absent from this container). Callers
can also inject their own kernel (`kernel=` on each operator) — the
seam the Spark plumbing is tested through. Everything Spark-side
(schemas, batch iteration, partitioning, column pruning before the
UDF) is real and tested.

Scale notes: media rows are fat — the operators force a narrow
projection before entering Python (only id + payload cross Arrow),
and `spark.sql.files.maxPartitionBytes` should be lowered (e.g. 32m)
when payloads average >1 MB so one task doesn't hold hundreds of
decoded frames.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # optional real codec for compressed images; absent here
    from PIL import Image as _PILImage  # type: ignore

    _HAS_PIL = True
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None
    _HAS_PIL = False

ImageKernel = Callable[[bytes], tuple[int, int, float]]
AudioKernel = Callable[[bytes], tuple[int, int, float]]

def _image_features_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )


def _audio_features_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )


def decode_bmp(payload: bytes) -> tuple[int, int, float] | None:
    """REAL decoder for uncompressed 24-bit BMP — pure `struct`, no
    external codec. Returns (width, height, mean Rec.601 luma in
    [0,1]) or None if the payload is not a well-formed BMP this
    parser handles (validation is strict so random bytes starting
    with b"BM" cannot slip through)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    file_size, px_off = struct.unpack_from("<I4xI", payload, 2)
    hdr_size, w, h, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if (
        hdr_size < 40
        or planes != 1
        or bpp != 24
        or compression != 0
        or w <= 0
        or not h  # top-down BMPs store negative height
        or file_size > len(payload)
        or px_off < 14 + hdr_size
    ):
        return None
    height = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if px_off + row_stride * height > len(payload):
        return None
    total = 0.0
    for r in range(height):
        row = payload[px_off + r * row_stride :][: w * 3]
        # pixels are little-endian BGR
        total += sum(
            0.114 * row[i] + 0.587 * row[i + 1] + 0.299 * row[i + 2]
            for i in range(0, w * 3, 3)
        )
    return w, height, total / (w * height) / 255.0


def decode_wav(payload: bytes) -> tuple[int, int, float] | None:
    """REAL decoder for PCM WAV — stdlib `wave`. Returns
    (sample_rate, n_samples, rms) or None when the payload is not a
    PCM WAV. rms is in [0,1] for the supported sample widths
    (8/16/24/32-bit); exotic widths return real header values with a
    -1.0 SENTINEL rms — filter `rms >= 0` before aggregating."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as wav:
            sr = wav.getframerate()
            n = wav.getnframes()
            width = wav.getsampwidth()
            frames = wav.readframes(n)
    except (wave.Error, EOFError):
        return None
    if width > 1:
        # a truncated data chunk can yield a partial trailing sample;
        # struct.unpack would raise and crash the task — trim to whole
        # samples instead
        frames = frames[: len(frames) - len(frames) % width]
    if not frames:
        return sr, n, 0.0
    if width == 1:  # unsigned 8-bit PCM, centred on 128
        total = sum((b - 128) ** 2 for b in frames)
        rms = (total / len(frames)) ** 0.5 / 128.0
    elif width == 2:
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
        rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / 32768.0
    elif width == 3:  # 24-bit little-endian signed
        cnt = len(frames) // 3
        total = sum(
            int.from_bytes(frames[3 * i : 3 * i + 3], "little", signed=True) ** 2
            for i in range(cnt)
        )
        rms = (total / cnt) ** 0.5 / 8388608.0
    elif width == 4:
        samples = struct.unpack(f"<{len(frames) // 4}i", frames)
        rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / 2147483648.0
    else:  # exotic widths: real header values, sentinel rms
        return sr, n, -1.0
    return sr, n, rms


def encode_bmp(rows: list[bytes], width: int) -> bytes:
    """REAL 24-bit BMP encoder — pure `struct`, the write-side twin of
    decode_bmp. `rows` are raw BGR byte rows in STORAGE order (3·width
    bytes each); rows pad to 4-byte stride per the format."""
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    px = b"".join(r + pad for r in rows)
    height = len(rows)
    header = struct.pack("<2sI2HI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return header + info + px


def resize_bmp_nearest(
    payload: bytes, out_w: int, out_h: int
) -> bytes | None:
    """REAL nearest-neighbor resize of an uncompressed 24-bit BMP:
    output pixel (r', c') copies source pixel (floor(r'·H/out_h),
    floor(c'·W/out_w)) in STORAGE order, re-encoded via encode_bmp.
    Returns None when the payload is not a BMP this parser handles
    (same strict validation as decode_bmp)."""
    if decode_bmp(payload) is None:
        return None
    px_off = struct.unpack_from("<I", payload, 10)[0]
    _, w, h = struct.unpack_from("<Iii", payload, 14)
    height = abs(h)
    row_stride = (w * 3 + 3) & ~3
    out_rows = []
    for r_out in range(out_h):
        src_r = r_out * height // out_h
        src_row = payload[px_off + src_r * row_stride :][: w * 3]
        row = bytearray()
        for c_out in range(out_w):
            src_c = c_out * w // out_w
            row += src_row[3 * src_c : 3 * src_c + 3]
        out_rows.append(bytes(row))
    if h < 0:
        # top-down BMP: storage order is visual order, but encode_bmp
        # writes positive-height (bottom-up) files — reverse so the
        # re-encoded image keeps the source orientation instead of
        # silently mirroring vertically
        out_rows.reverse()
    return encode_bmp(out_rows, out_w)


def _resize_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )


def image_resize(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kernel: Callable[[bytes, int, int], bytes | None] | None = None,
) -> DataFrame:
    """Resize image payloads to (out_w × out_h) via Arrow-batched
    mapInPandas — the transform step of the decode / feature-extract /
    resize / frame-sample family, with a REAL stdlib kernel for BMP
    (resize_bmp_nearest) and the same injection seam as the decoders
    for formats needing a real codec library. Output rows keep the
    binary payload column (re-encoded BMP) plus the out dims;
    non-resizable payloads surface as NULL payload with -1 dims —
    filter `width >= 0` downstream, the decode_wav sentinel
    convention. The id column keeps the caller's `id_col` name in the
    output (schema built per call)."""
    narrow = df.select(id_col, payload_col)
    resize = kernel or resize_bmp_nearest

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                out = resize(bytes(p) if p is not None else b"", out_w, out_h)
                if out is None:
                    rows.append((int(i), None, -1, -1))
                else:
                    rows.append((int(i), out, out_w, out_h))
            yield pd.DataFrame(
                rows, columns=[id_col, "payload", "width", "height"]
            )

    return narrow.mapInPandas(op, _resize_schema(id_col))


def _decode_image_bytes(payload: bytes) -> tuple[int, int, float]:
    """Layered image kernel: real BMP parse → PIL (when installed) →
    deterministic fake for codecs this container lacks.

    The fake derives stable pseudo dimensions from the payload so the
    plumbing stays testable (and oracle-able) on synthetic bytes.
    """
    real = decode_bmp(payload)
    if real is not None:
        return real
    if _HAS_PIL:  # pragma: no cover - container has no PIL
        try:
            img = _PILImage.open(io.BytesIO(payload))
            luma_img = img.convert("L")
            data = list(luma_img.getdata())
            return img.width, img.height, sum(data) / len(data) / 255.0
        except Exception:
            pass
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n // 7) % 512)
    mean_luma = float((n * 37) % 256) / 255.0 if n else 0.0
    return width, height, mean_luma


def encode_wav(
    samples: list[int], sample_rate: int, sampwidth: int = 2
) -> bytes:
    """REAL PCM WAV encoder — stdlib `wave`, the write-side twin of
    decode_wav. Mono, 16-bit by default."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        fmt = {1: "B", 2: "h", 4: "i"}[sampwidth]
        w.writeframes(struct.pack(f"<{len(samples)}{fmt}", *samples))
    return buf.getvalue()


def resample_wav_nearest(
    payload: bytes, out_rate: int
) -> bytes | None:
    """REAL nearest-neighbor resample of a 16-bit mono PCM WAV to
    `out_rate`: output sample k copies source sample
    floor(k·in_rate/out_rate) — the audio twin of resize_bmp_nearest
    (decimation/zero-order hold; production kernels would band-limit
    first, injected via the kernel seam). Returns None when the
    payload is not a 16-bit mono PCM WAV."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as wav:
            if wav.getsampwidth() != 2 or wav.getnchannels() != 1:
                return None
            in_rate = wav.getframerate()
            n = wav.getnframes()
            frames = wav.readframes(n)
    except (wave.Error, EOFError):
        return None
    frames = frames[: len(frames) - len(frames) % 2]
    src = struct.unpack(f"<{len(frames) // 2}h", frames)
    if not src:
        return encode_wav([], out_rate)
    out_n = max(len(src) * out_rate // in_rate, 1)
    out = [src[k * in_rate // out_rate] for k in range(out_n)]
    return encode_wav(out, out_rate)


def _resample_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )


def audio_resample(
    df: DataFrame,
    out_rate: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kernel: Callable[[bytes, int], bytes | None] | None = None,
) -> DataFrame:
    """Resample audio payloads to `out_rate` Hz via Arrow-batched
    mapInPandas — the audio transform of the decode/feature-extract/
    resize/frame-sample family, with the same injection seam and the
    NULL/-1 sentinel convention as image_resize. The id column keeps
    the caller's `id_col` name in the output."""
    narrow = df.select(id_col, payload_col)
    resample = kernel or resample_wav_nearest

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                out = resample(bytes(p) if p is not None else b"", out_rate)
                if out is None:
                    rows.append((int(i), None, -1))
                else:
                    rows.append((int(i), out, out_rate))
            yield pd.DataFrame(
                rows, columns=[id_col, "payload", "sample_rate"]
            )

    return narrow.mapInPandas(op, _resample_schema(id_col))


def _decode_audio_bytes(payload: bytes) -> tuple[int, int, float]:
    """Layered audio kernel: real PCM-WAV parse (stdlib `wave`) →
    deterministic fake for compressed codecs absent here."""
    real = decode_wav(payload)
    if real is not None:
        return real
    n = len(payload)
    sample_rate = 16000
    n_samples = n // 2  # pretend 16-bit PCM
    rms = float((n * 17) % 1000) / 1000.0 if n else 0.0
    return sample_rate, n_samples, rms


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kernel: ImageKernel | None = None,
) -> DataFrame:
    """Decode image payloads to (doc_id, n_bytes, width, height,
    mean_luma) via Arrow-batched mapInPandas.

    `kernel` injects a custom decoder `bytes -> (width, height,
    mean_luma)` (e.g. a GPU codec); default is the layered
    BMP/PIL/fake dispatch. The id column keeps the caller's `id_col`
    name in the output."""
    narrow = df.select(id_col, payload_col)  # prune before Python
    decode = kernel or _decode_image_bytes

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (
                    int(i),
                    len(p) if p is not None else 0,
                    *decode(bytes(p) if p is not None else b""),
                )
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                feats, columns=[id_col, "n_bytes", "width", "height", "mean_luma"]
            )

    return narrow.mapInPandas(op, _image_features_schema(id_col))


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    kernel: AudioKernel | None = None,
) -> DataFrame:
    """Decode audio payloads to (doc_id, n_bytes, sample_rate,
    n_samples, rms). `kernel` injects a custom decoder `bytes ->
    (sample_rate, n_samples, rms)`; default is WAV-real/fake. The id
    column keeps the caller's `id_col` name in the output."""
    narrow = df.select(id_col, payload_col)
    decode = kernel or _decode_audio_bytes

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (
                    int(i),
                    len(p) if p is not None else 0,
                    *decode(bytes(p) if p is not None else b""),
                )
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                feats,
                columns=[id_col, "n_bytes", "sample_rate", "n_samples", "rms"],
            )

    return narrow.mapInPandas(op, _audio_features_schema(id_col))


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 1024,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling stand-in: emit one row per sampled offset
    (doc_id, frame_idx, frame_bytes). Real kernel would seek keyframes
    with PyAV; the fake slices fixed strides so downstream batch
    shapes (one media row fanning out to many frame rows) are real."""
    narrow = df.select(id_col, payload_col)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(p) if p is not None else b""
                for k in range(0, max(len(payload), 1), every_n_bytes):
                    rows.append((int(i), k // every_n_bytes, payload[k : k + 64]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_bytes"])

    return narrow.mapInPandas(op, schema)
