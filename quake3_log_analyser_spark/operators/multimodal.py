"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures over ``mapInPandas`` — is real and tested.

``decode_image`` is REAL for two tiers of input:
  * any PIL-supported format (PNG/JPEG/…) when Pillow is importable —
    guarded import, never a hard dependency;
  * PPM (P6) and uncompressed 24-bit BMP via a pure-numpy parser that
    works in any environment (including this container, which has no
    codec libraries).
Audio/video codecs remain out of scope for this container; the
deterministic ``fake_decoder=True`` path keeps the full feature pipeline
testable for those kinds.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 32, 64, 16000, 30 + i, f"{kind}/x-fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _gradient_image(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB test pattern seeded by media id."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 17 + i) % 256, (y * 7 + 2 * i) % 256, (x + y + 3 * i) % 256],
        axis=2,
    ).astype(np.uint8)


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary P6 PPM."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> uncompressed bottom-up 24-bit BMP."""
    import struct

    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        raster += row + b"\x00" * (row_bytes - len(row))
    data_off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return bytes(header) + bytes(raster)


def synthetic_image_media(
    spark: SparkSession, n: int = 16, w: int = 12, h: int = 9, fmt: str = "ppm"
) -> DataFrame:
    """Media table whose payloads are REAL encoded images (P6 PPM or 24-bit
    BMP) of a deterministic gradient — exercises the real decode tier in
    environments without any codec library."""
    enc = {"ppm": encode_ppm, "bmp": encode_bmp}[fmt]
    rows = [
        (
            i,
            "image",
            bytearray(enc(_gradient_image(i, w, h))),
            (w, h, None, None, f"image/x-{fmt}"),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real codec: bytes -> unit feature vec."""
    h = hashlib.sha256(payload or b"").digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    v = v / np.linalg.norm(v)
    return v.astype(np.float32)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """P6 (binary) PPM -> HxWx3 uint8, pure numpy/stdlib."""
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (want 255)")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> HxWx3 uint8 (RGB), pure numpy/stdlib."""
    import struct

    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        raster = raster[::-1]
    return raster[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 RGB array.

    Two tiers: Pillow handles any format it knows when importable (guarded
    import — never a hard dependency); PPM (P6) and uncompressed 24-bit
    BMP decode via the pure-numpy parsers above in ANY environment.  An
    unrecognized payload raises ValueError with the magic bytes.
    """
    if not payload:
        raise ValueError("empty image payload")
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    try:
        from PIL import Image  # optional; absent in this container
    except ImportError:
        raise ValueError(
            f"unrecognized image magic {payload[:4]!r} and Pillow is not "
            "installed (pure-numpy tier handles P6 PPM and 24-bit BMP)"
        ) from None
    import io

    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono int16 samples -> RIFF/WAVE PCM bytes (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    return buf.getvalue()


def synthetic_audio_media(
    spark: SparkSession, n: int = 16, rate: int = 16000, seconds: float = 0.25
) -> DataFrame:
    """Media table whose payloads are REAL PCM WAV files (two-harmonic
    tones, frequency seeded by media id) — exercises the real audio tier
    in environments with no codec library at all (``wave`` is stdlib)."""
    t = np.arange(int(rate * seconds)) / rate
    rows = []
    for i in range(n):
        f0 = 200.0 + 50.0 * i
        sig = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
        rows.append(
            (
                i,
                "audio",
                bytearray(encode_wav((sig * 32767).astype(np.int16), rate)),
                (None, None, rate, None, "audio/wav"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV payload -> (mono float64 samples in [-1, 1], rate).

    REAL decode via stdlib ``wave`` — 8/16/32-bit PCM, any channel count
    (averaged to mono).  Compressed formats (MP3/OGG/...) have no
    in-container codec and raise ValueError, mirroring ``decode_image``'s
    unrecognized-magic contract."""
    import io
    import wave

    if not payload or payload[:4] != b"RIFF":
        raise ValueError(
            f"unrecognized audio magic {bytes(payload[:4])!r} (stdlib tier "
            "decodes RIFF/WAVE PCM; no compressed-audio codec in-container)"
        )
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch, sw, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        # RIFF magic but not a readable WAVE (an AVI, a truncated header):
        # normalize to the ValueError contract decode_image also keeps
        raise ValueError(f"RIFF payload is not decodable WAV: {e}") from e
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
    if dtype is None:
        raise ValueError(f"WAV sample width {sw} bytes unsupported (want 1/2/4)")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    x = (x - 128.0) / 128.0 if sw == 1 else x / float(2 ** (8 * sw - 1))
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> np.ndarray:
    """PCM samples -> fixed-width feature vector: duration, RMS,
    zero-crossing rate, then coarse log-spectral band energies
    (``numpy.fft.rfft``), padded/truncated to ``dim`` and L2-normalized —
    deterministic, codec-independent (the audio twin of image_features)."""
    n = len(samples)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    dur = n / rate
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(samples))
    n_bands = max(1, dim - 3)
    bands = [
        float(np.log1p(chunk.mean())) if len(chunk) else 0.0
        for chunk in np.array_split(spec, n_bands)
    ]
    v = np.concatenate([[dur, rms, zcr], bands])[:dim]
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    norm = np.linalg.norm(v)
    return (v / norm if norm > 0 else v).astype(np.float32)


def image_features(img: np.ndarray, dim: int = 8) -> np.ndarray:
    """Pixel array -> fixed-width feature vector: per-channel mean/std plus
    a coarse nearest-neighbor-downsampled gray grid, padded/truncated to
    ``dim`` and L2-normalized — deterministic, codec-independent."""
    f = [img.mean(axis=(0, 1)) / 255.0, img.std(axis=(0, 1)) / 255.0]
    side = max(1, int(np.ceil(np.sqrt(max(dim - 6, 1)))))
    ys = np.linspace(0, img.shape[0] - 1, side).astype(int)
    xs = np.linspace(0, img.shape[1] - 1, side).astype(int)
    grid = img[np.ix_(ys, xs)].mean(axis=2).ravel() / 255.0
    v = np.concatenate([*f, grid])[:dim]
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 8, fake_decoder: bool = True
) -> DataFrame:
    """Binary payload -> feature vector via Arrow-batched ``mapInPandas``.

    Partition-preserving, columns pruned to (media_id, kind, payload); at
    scale this is the pattern for any decode/resize/frame-sample stage —
    one Python worker per partition, whole Arrow batches in and out.

    ``fake_decoder=False`` runs the REAL decoders — dispatched PER KIND:
    ``image`` rows hit ``decode_image`` (PPM/BMP always; PNG/JPEG when
    Pillow is importable), ``audio`` rows with RIFF/WAVE magic hit the
    stdlib PCM decode + spectral ``audio_features``; compressed-audio and
    ``video`` rows take the deterministic fake path (no such codecs in
    this container — declared), so a mixed media table never crashes on
    an undecodable payload.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                if not fake_decoder and kind == "image":
                    feats.append(image_features(decode_image(b), dim).tolist())
                elif not fake_decoder and kind == "audio" and b[:4] == b"RIFF":
                    try:
                        feats.append(
                            audio_features(*decode_audio(b), dim).tolist()
                        )
                    except ValueError:
                        # RIFF-but-undecodable (AVI container, truncated or
                        # 24-bit WAV): the never-crash dispatch contract
                        # sends it down the fake path like compressed audio
                        feats.append(_fake_decode(b, dim).tolist())
                else:
                    feats.append(_fake_decode(b, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explodes frame indices from metadata
    (the decode itself is the stubbed stage above)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
