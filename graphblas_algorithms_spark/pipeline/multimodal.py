"""Multimodal columns: opaque binary payloads + typed metadata.

Driver mandate: treat image/audio/video as ``binary`` columns; implement
decode / feature-extract / resize / frame-sample as pandas UDFs over
``mapInPandas``.  The decode step is STUBBED (no image/audio libs in
this container) behind ``DecoderRegistry`` — either a clearly-marked
``NotImplementedError`` or a deterministic fake — while the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
real and tested.

Schema convention::

    assets(asset_id: long, kind: string,        -- image|audio|video
           payload: binary,                      -- opaque encoded bytes
           meta: struct<width:int, height:int, sample_rate:int,
                        n_frames:int, codec:string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


class DecoderRegistry:
    """Pluggable decoders.  Real deployments register PIL/ffmpeg-backed
    callables; this container registers deterministic fakes so the
    distributed plumbing is exercised end-to-end."""

    _decoders: dict[str, object] = {}

    @classmethod
    def register(cls, kind: str, fn) -> None:
        cls._decoders[kind] = fn

    @classmethod
    def decode(cls, kind: str, payload: bytes, meta) -> list[float]:
        fn = cls._decoders.get(kind)
        if fn is None:
            # STUB: no real codec libraries in this environment.
            raise NotImplementedError(
                f"no decoder registered for kind={kind!r}; install/register "
                "a real decoder (PIL/torchaudio/ffmpeg) in production"
            )
        return fn(payload, meta)


def _fake_feature(payload: bytes, meta, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + feature-extract': sha256-seeded floats.
    Stands in for a real embedding so tests can assert shapes/values."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def register_fake_decoders(dim: int = 8) -> None:
    for kind in ("image", "audio", "video"):
        DecoderRegistry.register(kind, lambda p, m, d=dim: _fake_feature(p, m, d))


# ---- real byte-level codecs (pure numpy — no external libs) ---------------


def encode_ppm(pixels) -> bytes:
    """P6 binary PPM from a (h, w, 3) uint8 array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(payload: bytes):
    """(h, w, 3) uint8 from P6 binary PPM — real header parse (magic,
    whitespace/comments, dims, maxval) + raw RGB plane; pure numpy."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval ('#' comments allowed)
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return raw.reshape(h, w, 3)


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE PCM16 mono container from an int16 array."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes):
    """(samples int16 array, sample_rate) from RIFF/WAVE PCM16 mono —
    real chunk walk (fmt then data); pure numpy."""
    import struct

    import numpy as np

    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, sr = 12, None
    while i + 8 <= len(payload):
        cid, size = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, ch, sr = struct.unpack("<HHI", body[:8])
            if fmt != 1 or ch != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            if sr is None:
                raise ValueError("data chunk before fmt")
            return np.frombuffer(body, dtype="<i2"), sr
        i += 8 + size + (size % 2)
    raise ValueError("no data chunk")


def image_features(payload: bytes, meta) -> list[float]:
    """Real bytes -> pixels -> features: decode the P6 payload and reduce
    through EXACT integer aggregates (int64 sums / min / max / mod
    checksum), so the 8-dim feature vector is bit-deterministic and
    SQL-replayable — division by exact integer products is a single
    correctly-rounded IEEE op."""
    import numpy as np

    px = decode_ppm(payload)
    h, w, _ = px.shape
    v = px.astype(np.int64)
    npx = h * w
    s = v.sum(axis=(0, 1))  # per-channel int sums
    total = int(v.sum())
    return [
        w / 256.0,
        h / 256.0,
        int(s[0]) / (npx * 255.0),
        int(s[1]) / (npx * 255.0),
        int(s[2]) / (npx * 255.0),
        int(v.min()) / 255.0,
        int(v.max()) / 255.0,
        (total % 9973) / 9973.0,
    ]


def audio_features(payload: bytes, meta) -> list[float]:
    """Real bytes -> samples -> features from exact integer aggregates
    over the PCM16 stream (mean/abs-mean/min/max/zero-crossings/mod
    checksum) — deterministic and SQL-replayable like image_features."""
    import numpy as np

    s, sr = decode_wav_pcm16(payload)
    v = s.astype(np.int64)
    n = len(v)
    neg = v < 0
    zc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
    sabs = int(np.abs(v).sum())
    return [
        sr / 48000.0,
        n / 65536.0,
        int(v.sum()) / (n * 32768.0),
        sabs / (n * 32768.0),
        int(v.min()) / 32768.0,
        int(v.max()) / 32768.0,
        zc / n,
        (sabs % 9973) / 9973.0,
    ]


def register_builtin_decoders(dim: int = 8) -> None:
    """Register the REAL pure-numpy decoders for image (P6 PPM) and
    audio (RIFF/WAVE PCM16); video keeps the sha256 stand-in (container
    demuxing genuinely needs ffmpeg — documented stub)."""
    DecoderRegistry.register("image", lambda p, m: image_features(p, m))
    DecoderRegistry.register("audio", lambda p, m: audio_features(p, m))
    DecoderRegistry.register("video", lambda p, m, d=dim: _fake_feature(p, m, d))


def _synth_pixels(asset_id: int, w: int = 64, h: int = 48):
    """Deterministic pixel pattern v = (a*7 + x*3 + y*5 + c*11) % 256 —
    integer arithmetic the oracle reproduces in SQL."""
    import numpy as np

    y, x, c = np.mgrid[0:h, 0:w, 0:3]
    return ((asset_id * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)


def _synth_samples(asset_id: int):
    """Deterministic int16 samples s_i = ((a*13 + i*7) % 65536) - 32768
    over n = 800 + (a % 5)*160 samples."""
    import numpy as np

    n = 800 + (asset_id % 5) * 160
    i = np.arange(n, dtype=np.int64)
    return (((asset_id * 13 + i * 7) % 65536) - 32768).astype(np.int16)


def synth_assets(spark, n: int = 64, num_partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic asset table.  Since r5 the payloads are
    REAL encoded media for two kinds — P6 PPM images (64x48 RGB,
    deterministic pixel formula) and RIFF/WAVE PCM16 audio (deterministic
    sample formula) — built per-row in an Arrow-batched mapInPandas;
    video payloads remain seeded sha-hex bytes (no container codec in
    this environment)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, num_partitions).withColumnRenamed("id", "asset_id")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a in pdf["asset_id"]:
                a = int(a)
                k = ("image", "audio", "video")[a % 3]
                if k == "image":
                    payload = encode_ppm(_synth_pixels(a))
                elif k == "audio":
                    payload = encode_wav_pcm16(_synth_samples(a), 16000)
                else:
                    payload = hashlib.sha256(f"asset:{a}".encode()).hexdigest().encode()
                rows.append(
                    (a, k, payload, {"width": 64, "height": 48, "sample_rate": 16000,
                                     "n_frames": a % 30 + 1,
                                     "codec": {"image": "ppm", "audio": "pcm16",
                                               "video": "fake"}[k]})
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return base.mapInPandas(build, schema=ASSET_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """(asset_id, kind, feature: array<double>) via mapInPandas — one
    Arrow batch in, vectorized decode loop out (the decode itself is the
    pluggable/stubbed part; batching, schema and shuffle are real)."""

    # snapshot the registry BY VALUE: the closure must carry the decoder
    # callables to the executors — referencing the DecoderRegistry class
    # would pickle it by module reference, and the executor's fresh import
    # has an empty registry
    decoders = dict(DecoderRegistry._decoders)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for k, p in zip(pdf["kind"], pdf["payload"]):
                fn = decoders.get(k)
                if fn is None:
                    # STUB: no real codec libraries in this environment.
                    raise NotImplementedError(
                        f"no decoder registered for kind={k!r}; install/"
                        "register a real decoder (PIL/torchaudio/ffmpeg) "
                        "in production"
                    )
                feats.append(fn(p, None))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "feature": feats}
            )

    return assets.mapInPandas(
        run, schema="asset_id long, kind string, feature array<double>"
    )


def sample_frames(assets: DataFrame, every: int = 5) -> DataFrame:
    """(asset_id, frame_idx) — frame sampling plan for videos: pure
    Catalyst (sequence + explode); the actual pixel fetch would join this
    against the decode UDF."""
    vids = assets.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    return vids.select("asset_id", F.explode(idx).alias("frame_idx"))


def resize_plan(assets: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """(asset_id, scale_x, scale_y) — resize parameters computed scan-side;
    the pixel work lives in the decode UDF."""
    imgs = assets.filter(F.col("kind") == "image")
    return imgs.select(
        "asset_id",
        F.round(F.lit(target_w) / F.col("meta.width"), 6).alias("scale_x"),
        F.round(F.lit(target_h) / F.col("meta.height"), 6).alias("scale_y"),
    )
