"""Multimodal (binary) columns: decode / feature-extract plumbing
(north-star extension — image/audio/video as opaque ``binary`` + typed
metadata).

The real decoders (PIL/soundfile) are NOT in this container; the decode
path is import-guarded: ``_probe_decoders`` activates a real PIL/soundfile
kernel per media type when the runtime provides the library, and
``best_available_decode`` falls back to the deterministic fake otherwise
(``_decode_real`` raises a clearly-marked ``NotImplementedError`` for
types with no installed decoder).  Everything Spark-side is real and
tested — schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partitioning — and a test pins that swapping decoders changes ONLY the
feature column, never the contract columns.

Scale notes: media blobs are large and decode is CPU-bound Python —
``mapInPandas`` streams Arrow batches through the worker (never a
row-at-a-time UDF, never a driver collect), and the operators repartition
by content hash first so decode work spreads evenly regardless of how the
blobs were written.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.readers import load_table

#: Schema for a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

_FEATURE_DIM = 8


def _probe_decoders() -> dict:
    """Import-guarded probe for real media decoders (VERDICT r4 #7).

    Returns ``{media_type: decode_fn}`` for every library the runtime
    actually provides; empty in this container (no PIL / soundfile).
    Probed lazily per worker process (module import is cheap and cached),
    so shipping the package to a cluster WITH the libraries activates
    real decoding with no code change.
    """
    decoders: dict = {}
    try:  # pillow → image features
        import io as _io

        from PIL import Image  # type: ignore[import-not-found]

        def _decode_image(payload: bytes) -> np.ndarray:
            img = Image.open(_io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img, dtype="float64") / 255.0
            per_ch = arr.reshape(-1, 3)
            return np.concatenate(
                [
                    per_ch.mean(axis=0),
                    per_ch.std(axis=0),
                    [arr.shape[1] / 4096.0, arr.shape[0] / 4096.0],
                ]
            )[:_FEATURE_DIM]

        decoders["image"] = _decode_image
    except ImportError:
        pass
    try:  # soundfile → audio features
        import io as _io

        import soundfile as sf  # type: ignore[import-not-found]

        def _decode_audio(payload: bytes) -> np.ndarray:
            data, rate = sf.read(_io.BytesIO(payload), dtype="float64")
            mono = data if data.ndim == 1 else data.mean(axis=1)
            return np.array(
                [
                    mono.mean(),
                    mono.std(),
                    np.abs(mono).max(initial=0.0),
                    np.sqrt(np.mean(mono**2)),
                    float(len(mono)),
                    float(rate),
                    float((np.diff(np.signbit(mono)) != 0).sum()),
                    float(np.percentile(np.abs(mono), 95) if len(mono) else 0.0),
                ]
            )[:_FEATURE_DIM]

        decoders["audio"] = _decode_audio
    except ImportError:
        pass
    return decoders


def _decode_real(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode: dispatch to whichever library the runtime provides.

    Raises ``NotImplementedError`` for media types without an installed
    decoder — in this container that is all of them (no PIL/soundfile);
    ``best_available_decode`` is the graceful entry point.
    """
    decoders = _probe_decoders()
    fn = decoders.get(media_type)
    if fn is None:
        raise NotImplementedError(
            f"no decoder available for media_type={media_type!r}; install "
            "pillow (image) / soundfile (audio), or use "
            "deterministic_fake_decode / best_available_decode"
        )
    return fn(payload)


def best_available_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode when the runtime has a library for this media type,
    deterministic fake otherwise — the production default: the same
    query runs in both environments, with identical contract columns
    (asset_id / byte_len / payload_sha256) and environment-dependent
    feature values."""
    if media_type in _probe_decoders():
        return _decode_real(payload, media_type)
    return deterministic_fake_decode(payload, media_type)


def deterministic_fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: derives an
    ``_FEATURE_DIM``-vector from the sha256 of the payload.  Stable across
    runs/executors, so tests can pin exact outputs."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: _FEATURE_DIM * 4], dtype="<u4").astype("float64")
    return raw / np.float64(2**32)  # [0, 1) components


def extract_features(assets: DataFrame, decode=deterministic_fake_decode) -> DataFrame:
    """Decode + featurize every asset via Arrow-batched ``mapInPandas``.

    Repartitions on a payload hash first: media tables are typically
    written clustered by source, which would otherwise put all the
    expensive blobs of one origin on one task.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return assets.repartition(F.xxhash64("payload")).mapInPandas(
        batches, FEATURE_SCHEMA
    )


def documents_as_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: treat each document's UTF-8 text as an opaque binary
    payload — the testdata ships no media table, and this exercises the
    identical binary-column plumbing with real data."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


@register(
    "q_multimodal_features",
    oracle="""
SELECT doc_id AS asset_id,
       CAST(length(text) AS BIGINT) AS byte_len,
       sha256(text) AS payload_sha256
FROM documents
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction, oracle-checked on its
    deterministic projections: the ``mapInPandas`` pipeline's byte length
    and sha256 must agree with DuckDB computing the same over the source
    text (documents.text is ASCII, so char length == byte length).  The
    fake-decode feature vector is engine-side only (no SQL twin) and is
    pinned by a unit test instead."""
    feats = extract_features(documents_as_assets(spark, sf_dir))
    return feats.select("asset_id", "byte_len", "payload_sha256")


# Frame sampling: N evenly-spaced fixed-length byte windows per payload —
# the video-frame-sampling plumbing shape (1 input row → N frame rows
# through the Arrow batch).  Offsets use pure integer arithmetic so the
# oracle derives identical frames.
_FRAME_LEN = 32
_N_FRAMES = 4

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(assets: DataFrame) -> DataFrame:
    """Evenly-spaced frame sampling over binary payloads via Arrow-batched
    ``mapInPandas`` — each input row yields ``_N_FRAMES`` frame rows
    (frame i starts at 1-based offset ``(len - L) * i // (N-1) + 1``).
    A real sampler would hand each window to the decoder; the frame
    digest stands in for the decoded tensor, keeping every byte of the
    plumbing (offsets, batch explosion, schema) real and oracle-checkable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, digests = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                lo = len(payload)
                if lo < _FRAME_LEN:
                    continue
                for i in range(_N_FRAMES):
                    off = (lo - _FRAME_LEN) * i // (_N_FRAMES - 1) + 1
                    frame = payload[off - 1 : off - 1 + _FRAME_LEN]
                    ids.append(aid)
                    idxs.append(i)
                    offs.append(off)
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return assets.repartition(F.xxhash64("payload")).mapInPandas(batches, FRAME_SCHEMA)


@register(
    "q_multimodal_framesample",
    oracle=f"""
SELECT d.doc_id AS asset_id,
       CAST(t.i AS INTEGER) AS frame_idx,
       CAST(((length(d.text) - {_FRAME_LEN}) * t.i) // {_N_FRAMES - 1} + 1 AS INTEGER)
           AS frame_off,
       md5(substr(d.text,
                  ((length(d.text) - {_FRAME_LEN}) * t.i) // {_N_FRAMES - 1} + 1,
                  {_FRAME_LEN})) AS frame_md5
FROM documents d
CROSS JOIN (SELECT unnest(generate_series(0, {_N_FRAMES - 1})) AS i) t
WHERE length(d.text) >= {_FRAME_LEN}
""",
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: the
    ``mapInPandas`` 1-row→N-frames batch explosion, exact-oracle-checked —
    DuckDB recomputes each frame's offset with the same integer
    arithmetic and its md5 over the same bytes (documents.text is ASCII,
    so char slicing == byte slicing).  Scale shape: content-hash
    repartition spreads decode work; frames never leave the worker as
    raw bytes (only offsets + digests/tensors), which is what keeps a
    100 TB video corpus from shuffling itself as pixels."""
    frames = sample_frames(documents_as_assets(spark, sf_dir))
    return frames


# Fake resize: byte-stride downsampling (every 4th byte) — the
# shape-preserving stand-in for an image thumbnail: output is smaller,
# derived deterministically from the payload, and its size/digest are
# pure functions the oracle recomputes.
_RESIZE_STRIDE = 4

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("orig_len", T.LongType()),
        T.StructField("resized_len", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_assets(assets: DataFrame) -> DataFrame:
    """Thumbnail/resize plumbing via Arrow-batched ``mapInPandas``: each
    payload shrinks by ``_RESIZE_STRIDE`` (a real implementation hands
    the bytes to an image library and emits the re-encoded thumbnail
    bytes; STUB keeps every offset deterministic so the oracle can check
    the plumbing end-to-end)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [bytes(p[::_RESIZE_STRIDE]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "orig_len": pdf["payload"].map(len).astype("int64"),
                    "resized_len": pd.Series([len(r) for r in resized], dtype="int64"),
                    "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return assets.repartition(F.xxhash64("payload")).mapInPandas(
        batches, RESIZE_SCHEMA
    )


@register(
    "q_multimodal_resize",
    oracle=f"""
WITH resized AS (
    SELECT doc_id AS asset_id,
           CAST(length(text) AS BIGINT) AS orig_len,
           array_to_string(
               list_transform(generate_series(1, length(text), {_RESIZE_STRIDE}),
                              i -> substr(text, i, 1)), '') AS thumb
    FROM documents
)
SELECT asset_id, orig_len,
       CAST(length(thumb) AS BIGINT) AS resized_len,
       md5(thumb) AS resized_md5
FROM resized
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail plumbing over binary payloads, oracle-checked:
    python slicing ``payload[::4]`` must byte-match DuckDB taking every
    4th character of the same (ASCII) source — sizes and digests agree
    exactly, proving the Arrow batch path transforms the right bytes.
    Scale note: thumbnails (not full payloads) are what flows to the
    next stage, cutting the shuffled volume by the stride factor."""
    return resize_assets(documents_as_assets(spark, sf_dir))


# Audio-style windowed feature extraction: non-overlapping fixed-length
# sample windows per payload, per-window RMS energy — the framing shape a
# real audio pipeline (spectrograms, VAD, loudness normalization) runs
# over decoded PCM.  Payload bytes stand in for unsigned 8-bit samples:
# the decode stub is honest (_decode_real raises), the framing/batch
# plumbing and arithmetic are real and byte-exact across engines.
_WIN_LEN = 256

AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("win_off", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_windows(assets: DataFrame) -> DataFrame:
    """Frame each payload into ``len // _WIN_LEN`` non-overlapping windows
    and compute per-window RMS of the byte values via Arrow-batched
    ``mapInPandas``.  All arithmetic is exact until the final sqrt: byte
    values ≤ 255, so the window's sum of squares is an exact integer and
    the mean divides by a power of two; rounding uses the engine-portable
    ``floor(x·1e6 + 0.5)`` (same convention as the quantization audit)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, rmss = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                for w in range(len(arr) // _WIN_LEN):
                    seg = arr[w * _WIN_LEN : (w + 1) * _WIN_LEN].astype(np.float64)
                    rms = float(np.sqrt(np.mean(seg * seg)))
                    ids.append(aid)
                    idxs.append(w)
                    offs.append(w * _WIN_LEN + 1)
                    rmss.append(np.floor(rms * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "win_off": pd.Series(offs, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return assets.repartition(F.xxhash64("payload")).mapInPandas(
        batches, AUDIO_WINDOW_SCHEMA
    )


@register(
    "q_multimodal_audio_windows",
    oracle=f"""
WITH chars AS (
    SELECT doc_id,
           unnest(generate_series(1, (length(text) // {_WIN_LEN}) * {_WIN_LEN}))
               AS i
    FROM documents
),
coded AS (
    SELECT c.doc_id,
           CAST((c.i - 1) // {_WIN_LEN} AS INT) AS w,
           ascii(d.text[c.i]) AS code
    FROM chars c JOIN documents d USING (doc_id)
)
SELECT doc_id AS asset_id,
       w AS win_idx,
       CAST(w * {_WIN_LEN} + 1 AS INT) AS win_off,
       floor(sqrt(avg(CAST(code * code AS DOUBLE))) * 1000000 + 0.5) / 1000000
           AS rms
FROM coded
GROUP BY doc_id, w
""",
)
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality framing: per-asset non-overlapping 256-sample
    windows with per-window RMS energy, byte-exact against DuckDB
    computing the identical arithmetic over the same payload bytes
    (documents.text is ASCII, so character codes ARE the payload bytes).
    One input row explodes to len//256 window rows through the Arrow
    batch — the same 1→N shape as frame sampling, on the audio axis."""
    return audio_windows(documents_as_assets(spark, sf_dir))
