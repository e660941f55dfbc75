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


def synth_assets(spark, n: int = 64, num_partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic asset table (binary payload = seeded bytes)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, num_partitions).withColumnRenamed("id", "asset_id")
    kind = (
        F.when(F.pmod("asset_id", F.lit(3)) == 0, "image")
        .when(F.pmod("asset_id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(
        F.sha2(F.concat(F.lit("asset:"), F.col("asset_id").cast("string")), 256),
        "utf-8",
    )
    meta = F.struct(
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod("asset_id", F.lit(30)) + 1).cast("int").alias("n_frames"),
        F.lit("fake").alias("codec"),
    )
    return base.select(
        "asset_id", kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


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
