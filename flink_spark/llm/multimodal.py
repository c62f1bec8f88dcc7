"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched pandas UDFs.

Design for 100 TB: the binary column never leaves the JVM until a decode
step genuinely needs Python; metadata (size, hash, mime) is computed with
JVM expressions so filtering/partition pruning happens before any decode.
The decode itself is `mapInPandas` — Arrow batches, one Python process per
core, no per-row ser/de.

The container has no image/audio codecs, so `decode_stub` is a clearly
marked deterministic fake: real Spark-side plumbing (schema, batching,
binary handling), stubbed codec. Swap `_fake_decode` for PIL/librosa in a
real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, mime STRING, byte_mean DOUBLE, "
    "byte_min INT, byte_max INT, feature_ok BOOLEAN"
)


def attach_binary(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text,
    plus JVM-computed metadata (what a real ingest would persist)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        id_col,
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.lit("text/plain").alias("mime"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a codec. Real deployments replace this
    with e.g. PIL.Image.open(io.BytesIO(payload)).
    """
    if payload is None:
        return {"byte_mean": None, "byte_min": None, "byte_max": None, "ok": False}
    arr = bytearray(payload)
    if not arr:
        return {"byte_mean": None, "byte_min": None, "byte_max": None, "ok": False}
    return {
        "byte_mean": sum(arr) / len(arr),
        "byte_min": min(arr),
        "byte_max": max(arr),
        "ok": True,
    }


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "mime": pdf["mime"],
                    "byte_mean": feats.map(lambda d: d["byte_mean"]),
                    "byte_min": feats.map(lambda d: d["byte_min"]),
                    "byte_max": feats.map(lambda d: d["byte_max"]),
                    "feature_ok": feats.map(lambda d: d["ok"]),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64,
                 id_col: str = "doc_id") -> DataFrame:
    """'Frame sampling' on the opaque payload: take 1 byte every N as a
    cheap signature — JVM-only (substring on binary), shows the
    slice-without-decode pattern used for video keyframe selection."""
    n_frames = (F.col("n_bytes") / every_n_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return df.select(
        id_col,
        F.explode(idx).alias("frame_no"),
    ).withColumn("frame_offset", F.col("frame_no") * every_n_bytes)
