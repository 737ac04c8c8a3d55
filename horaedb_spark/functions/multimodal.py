"""Multimodal column support (LLM-pipeline surface).

Design: media payloads are opaque ``binary`` columns traveling with a typed
metadata struct ``{modality, mime, width, height, duration_ms}``. Transform
operators (decode, resize, frame-sample, feature-extract) run as Arrow-batched
``mapInPandas`` stages so the byte-heavy work stays off the driver and each
executor processes whole record batches.

The actual codec calls are STUBBED here (image/audio libraries are not in
this container): ``decode_image`` raises ``NotImplementedError`` unless a
decoder is injected, and ``extract_features`` ships a deterministic
bytes-derived fake so the Spark-side plumbing — schema, batch iteration,
partitioning — is real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str, modality: str, mime: str
) -> DataFrame:
    """Wrap a binary payload with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_image(payload: bytes, decoder: Callable[[bytes], object] | None = None):
    """Image decode hook. No codec libraries ship in this container — inject
    ``decoder`` (e.g. PIL.Image.open) in a real deployment."""
    if decoder is None:
        raise NotImplementedError(
            "image decoding requires an injected decoder (no codec libs in this build)"
        )
    return decoder(payload)


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: byte-histogram
    moments. Replace with a real model call in deployment."""
    if not payload:
        return [0.0] * dim
    out = []
    for i in range(dim):
        sl = payload[i::dim]
        out.append((sum(sl) / len(sl)) / 255.0 if sl else 0.0)
    return out


def extract_features(
    media: DataFrame, id_col: str, payload_col: str, modality_col: str = "media_meta.modality"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (the mapInPandas
    operator shape a real decode/embed stage uses — batch in, batch out)."""
    import hashlib

    import pandas as pd

    cols = media.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(modality_col).alias("modality"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                    "features": [_fake_features(p) for p in payloads],
                }
            )

    return cols.mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("frame_digest", T.StringType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, id_col: str, payload_col: str, frame_size: int, k: int
) -> DataFrame:
    """Evenly sample up to ``k`` fixed-size frames from each opaque payload
    (the video frame-sampling operator shape): frame j of a payload with
    ``n = len // frame_size`` frames is index ``j*n//k`` (deduplicated). The
    byte-slicing and Arrow batch plumbing are real; a production build swaps
    the byte-window slicer for a container-aware demuxer."""
    import hashlib

    import pandas as pd

    cols = media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads, digests, sizes = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                n_frames = len(raw) // frame_size
                if n_frames <= 0:
                    continue
                for fi in sorted({(j * n_frames) // k for j in range(k)}):
                    fr = raw[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(int(mid))
                    idxs.append(fi)
                    payloads.append(fr)
                    digests.append(hashlib.md5(fr).hexdigest())
                    sizes.append(len(fr))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_payload": pd.Series(payloads, dtype="object"),
                    "frame_digest": pd.Series(digests, dtype="object"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return cols.mapInPandas(run, FRAMES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(
    media: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image-resize operator plumbing: Arrow-batched mapInPandas with the
    (payload, width, height) output contract. The decode+resample itself
    needs a codec — inject ``resizer(payload, w, h) -> bytes`` (e.g. a
    PIL-based callable) in deployment; without one this raises
    ``NotImplementedError`` at execution, mirroring ``decode_image``."""
    import pandas as pd

    cols = media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "resize requires an injected resizer (no codec libs in this build)"
                )
            out = [resizer(bytes(p), width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": pd.Series(out, dtype="object"),
                    "width": pd.Series([width] * len(out), dtype="int32"),
                    "height": pd.Series([height] * len(out), dtype="int32"),
                }
            )

    return cols.mapInPandas(run, RESIZED_SCHEMA)

def perceptual_hash_bits(
    media: DataFrame, id_col: str, text_col: str, cells: int = 16
) -> DataFrame:
    """Average-hash (aHash) over the deterministic fake decode: the payload
    bytes fold into ``cells`` stride cells (the stand-in for an 8x8
    grayscale thumbnail — a real deployment swaps the fake decode for a
    codec + resize, the hash math is identical), each cell's mean compares
    against the BYTE-WEIGHTED global mean (sum of all codes / total byte
    count) -> one bit per cell. The byte-weighted mean is intentional: it
    keeps the threshold an exact integer ratio (bit-identical across
    engines), and it equals the textbook mean-of-cell-means whenever the
    cells are equal-sized — which a real thumbnail resize guarantees; only
    this fake stride decode can produce a ragged last stripe.

    Distributed shape: explode to (id, pos, code) rows, two key-partitioned
    aggregates (per-cell mean, then per-id bit assembly) — all JVM-side
    expressions, no UDF; the hash is exact-deterministic across engines
    (integer sums, one double division, strict > comparison).
    Returns (id_col, bits array<int> of length ``cells``)."""
    codes = media.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length(text_col)),
                lambda i: F.ascii(F.col(text_col).substr(i, F.lit(1))),
            )
        ).alias("pos", "code"),
    )
    per_cell = codes.groupBy(id_col, (F.col("pos") % cells).alias("cell")).agg(
        F.sum("code").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_cell.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("cell", (F.col("s") / F.col("n")).alias("m"))
                )
            ).alias("cm"),
            (F.sum("s") / F.sum("n")).alias("gm"),
        )
        .select(
            id_col,
            F.transform(
                "cm", lambda x: F.when(x["m"] > F.col("gm"), 1).otherwise(0)
            ).alias("bits"),
        )
    )

