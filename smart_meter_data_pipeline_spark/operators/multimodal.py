"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The pattern a 100 TB multimodal pipeline needs: media lives in a
``binary`` column (or pointers to object storage), metadata in typed
columns; decode / feature-extraction runs as Arrow-batched Python over
``mapInPandas`` (never row-at-a-time UDFs). The container has no
image/audio libraries, so the *decoders* are stubbed exactly as the
spec requires — ``decode_image``/``decode_audio`` raise
``NotImplementedError`` — while everything Spark-side (schema, batch
iteration, partitioning, output contract) is real and oracle-checked
via a deterministic feature extractor (md5 + byte stats, which DuckDB
can reproduce).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table


def decode_image(payload: bytes) -> object:
    """STUB — real deployments plug Pillow/libvips here. The container
    ships no image codecs, so decoding is explicitly unimplemented."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; plug a decoder into extract_features' batch loop"
    )


def decode_audio(payload: bytes) -> object:
    """STUB — see :func:`decode_image`."""
    raise NotImplementedError("audio decoding not available in this environment")


def with_binary_content(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload column + typed metadata struct —
    the storage schema for multimodal rows (binary column stays
    untouched by Catalyst; metadata columns prune/push down)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    This is where a real pipeline decodes media and emits embeddings /
    thumbnails / spectrograms; here the per-payload work is a
    deterministic md5 + byte-sum so the plumbing is verifiable. The
    batch loop shape (pandas in → pandas out, schema declared up
    front) is exactly what a decoder drops into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "byte_sum": payloads.map(lambda b: sum(bytes(b))).astype(
                        "int64"
                    ),
                }
            )

    return binary_df.mapInPandas(batches, _FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payloads → mapInPandas feature extraction.
    The oracle recomputes md5/length in DuckDB — any drift in the
    Python batch path (encoding, batch boundaries, schema) breaks the
    hash. byte_sum has no clean SQL twin and is covered in pytest."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_content(docs)).select(
        "doc_id", "n_bytes", "content_md5"
    )


register(
    "multimodal_features",
    """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5
FROM documents
""",
)(multimodal_features)


# ---------------------------------------------------------------------------
# Resize (1→1) and frame-sample (1→N) batch shapes
# ---------------------------------------------------------------------------

THUMB_W = 8
THUMB_H = 8
FRAME_SIZE = 32
FRAME_STRIDE = 2

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("n_src_bytes", T.IntegerType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_images(
    binary_df: DataFrame, out_w: int = THUMB_W, out_h: int = THUMB_H
) -> DataFrame:
    """Arrow-batched resize over the binary column (1 row in → 1 row
    out, fixed-size payload out).

    A real deployment calls :func:`decode_image` + an interpolating
    resampler per payload inside the same batch loop; codec-less here,
    the "thumbnail" is the payload cycled to exactly ``out_w*out_h``
    bytes — deterministic, so the whole batch path is oracle-checked
    (md5 of the fake thumb has an exact DuckDB twin). The Spark-side
    contract a decoder drops into is unchanged: declared output schema,
    pandas in/out, binary column never touches Catalyst expressions."""
    wh = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def thumb_md5(payload) -> str:
            b = bytes(payload)
            rep = b * ((wh + len(b) - 1) // len(b))
            return hashlib.md5(rep[:wh]).hexdigest()

        for pdf in it:
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_src_bytes": payloads.map(len).astype("int32"),
                    "thumb_md5": payloads.map(thumb_md5),
                }
            )

    return binary_df.mapInPandas(batches, _RESIZE_SCHEMA)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(with_binary_content(docs))


register(
    "multimodal_resize",
    f"""
SELECT doc_id,
       {THUMB_W} AS out_w,
       {THUMB_H} AS out_h,
       length(text) AS n_src_bytes,
       md5(substr(repeat(text,
                         CAST(ceil({THUMB_W * THUMB_H}.0 / length(text)) AS INT)),
                  1, {THUMB_W * THUMB_H})) AS thumb_md5
FROM documents
""",
)(multimodal_resize)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    binary_df: DataFrame,
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame sampling over the binary column: treat each payload as
    consecutive ``frame_size``-byte frames, emit every ``stride``-th —
    the 1-row-in → N-rows-out batch shape of video frame extraction.
    Output cardinality is data-dependent per input row, which is why
    this must be ``mapInPandas`` (a scalar pandas_udf cannot change
    row count)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, totals, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                n_frames = len(b) // frame_size
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
                    md5s.append(
                        hashlib.md5(
                            b[i * frame_size : (i + 1) * frame_size]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return binary_df.mapInPandas(batches, _FRAME_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_content(docs))


register(
    "multimodal_frame_sample",
    f"""
WITH d AS (
  SELECT doc_id, text, length(text) // {FRAME_SIZE} AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(idx AS INT) AS frame_idx,
       CAST(n_frames AS INT) AS n_frames,
       md5(substr(text, CAST(idx * {FRAME_SIZE} + 1 AS INT), {FRAME_SIZE}))
         AS frame_md5
FROM d, range(0, 65536) t(idx)
WHERE idx < n_frames AND idx % {FRAME_STRIDE} = 0
""",
)(multimodal_frame_sample)


SHARD_BUDGET_BYTES = 32768


def pack_shards(binary_df: DataFrame) -> DataFrame:
    """Greedy sequential shard packing of binary payloads: within each
    source stream (deterministic doc_id order) items are appended
    until the running byte total crosses the shard budget — the
    WebDataset/tar-shard layout step every multimodal training
    pipeline runs between curation and the dataloader. An item whose
    START offset lies in budget-window k belongs to shard k, so a
    shard overflows by at most the one item that crossed its boundary
    (no splitting) — and an item larger than the budget skips the
    window indices it spans (shard ids are ordered but not
    necessarily contiguous; the property test pins exactly this).

    Scale shape: one cumulative-sum window per source partition (the
    natural write-stream unit — partitions are independent and the
    window never crosses them), then one (source, shard) rollup.
    All-integer arithmetic."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = binary_df.select(
        "source", "doc_id", F.col("meta.n_bytes").alias("n_bytes")
    ).withColumn("running", F.sum("n_bytes").over(w))
    return (
        sized.withColumn(
            "shard_idx",
            F.expr(
                f"CAST((running - n_bytes) div {SHARD_BUDGET_BYTES}"
                " AS BIGINT)"
            ),
        )
        .groupBy("source", "shard_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
            F.max("doc_id").cast("bigint").alias("last_doc_id"),
        )
    )


def multimodal_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_src = with_binary_content(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return pack_shards(with_src)


register(
    "multimodal_shard_pack",
    f"""
WITH sized AS (
  SELECT source, doc_id, strlen(text) AS n_bytes,
         SUM(strlen(text)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS running
  FROM documents
)
SELECT source,
       CAST((running - n_bytes) // {SHARD_BUDGET_BYTES} AS BIGINT)
           AS shard_idx,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc_id
FROM sized
GROUP BY 1, 2
""",
)(multimodal_shard_pack)


def multimodal_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the OPAQUE binary payload: group by
    md5(content) without ever decoding — the first pass every
    multimodal corpus runs (identical image/audio bytes re-crawled
    under different ids), and the reason payload dedup needs no codec
    at all. Output: one row per distinct payload (min doc_id kept,
    copy count, payload size) — this synthetic corpus plants NEAR-dups
    only, so every group has n_copies = 1 here; the filter
    `n_copies > 1` is the caller's one-line drop rule.

    The hash gate works because the payload is the UTF-8 encoding of
    the text column, so DuckDB's VARCHAR md5 reproduces Spark's binary
    md5 byte-for-byte (same trick as multimodal_features).

    Scale shape: ONE shuffle on the 32-char digest (fixed width, never
    the payload itself — the binary column stays partition-local);
    map-side partial aggregation applies."""
    docs = load_table(spark, sf_dir, "documents")
    rows = with_binary_content(docs)
    return (
        rows.groupBy(F.md5("content").alias("content_md5"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min(F.col("meta.n_bytes")).cast("bigint").alias("n_bytes"),
        )
    )


register(
    "multimodal_dup_groups",
    """
SELECT md5(text) AS content_md5,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(octet_length(encode(text))) AS BIGINT) AS n_bytes
FROM documents
GROUP BY md5(text)
""",
)(multimodal_dup_groups)


# ---------------------------------------------------------------------------
# Activity-detection segmentation (the audio-VAD shape)
# ---------------------------------------------------------------------------

VAD_FRAME_BYTES = 64

_VAD_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("n_marks", T.IntegerType()),
    ]
)


def frame_activity(binary_df: DataFrame) -> DataFrame:
    """Fixed-width framing + per-frame activity feature over the
    opaque payload, Arrow-batched — the exact seam a real audio VAD
    occupies (frame the PCM, score each frame's energy). The decoder
    is the documented stub (:func:`decode_audio`); the deterministic
    surrogate scores each {VAD_FRAME_BYTES}-byte frame by its digit
    count, which DuckDB reproduces character-wise so the whole
    framing → scoring → segmentation loop sits under the hash gate."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                for f, off in enumerate(
                    range(0, len(b), VAD_FRAME_BYTES)
                ):
                    chunk = b[off : off + VAD_FRAME_BYTES]
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            len(chunk),
                            sum(1 for c in chunk if c in (113, 106)),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_id", "frame_len", "n_marks"]
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        batches, schema=_VAD_FRAME_SCHEMA
    )


def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style segmentation end to end: frame the binary
    payload ({VAD_FRAME_BYTES}-byte frames, Arrow-batched Python — the
    codec seam), mark frames active (digit-bearing, the deterministic
    energy surrogate), then merge consecutive active frames into
    segments with the gaps-and-islands window — the structure a
    speech pipeline emits as utterances before transcription, with
    frame scoring in the (stubbed) codec layer and ALL segmentation
    logic declarative Spark.

    Scale shape: mapInPandas is the only Python (per-byte work — the
    codec's job even in production); the island window partitions by
    doc_id; the output is segment-count-sized."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    frames = frame_activity(with_binary_content(docs))
    active = frames.filter(F.col("n_marks") >= 1)
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    grouped = active.withColumn(
        "grp", F.col("frame_id") - F.row_number().over(w)
    )
    return (
        grouped.groupBy("doc_id", "grp")
        .agg(
            F.min("frame_id").cast("int").alias("seg_start_frame"),
            F.max("frame_id").cast("int").alias("seg_end_frame"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.sum("n_marks").cast("bigint").alias("n_marks"),
        )
        .drop("grp")
    )


register(
    "multimodal_vad_segments",
    f"""
WITH pos AS (
  SELECT doc_id,
         UNNEST(generate_series(1, length(text))) AS i,
         text
  FROM documents
),
frames AS (
  SELECT doc_id,
         CAST((i - 1) // {VAD_FRAME_BYTES} AS INT) AS frame_id,
         SUM(CASE WHEN substr(text, i, 1) IN ('q', 'j')
                  THEN 1 ELSE 0 END) AS n_marks
  FROM pos GROUP BY 1, 2
),
active AS (
  SELECT doc_id, frame_id, n_marks,
         frame_id - row_number() OVER (
           PARTITION BY doc_id ORDER BY frame_id) AS grp
  FROM frames WHERE n_marks >= 1
)
SELECT doc_id,
       CAST(MIN(frame_id) AS INT) AS seg_start_frame,
       CAST(MAX(frame_id) AS INT) AS seg_end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(n_marks) AS BIGINT) AS n_marks
FROM active
GROUP BY doc_id, grp
""",
)(multimodal_vad_segments)


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (round 9)
# ---------------------------------------------------------------------------

PHASH_BITS = 48           # block-mean hash width (4 x 12-bit bands)
PHASH_BANDS = 4
PHASH_MAX_HAMMING = 3  # = PHASH_BANDS - 1, the sound pigeonhole radius

_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)


def phash_signatures(binary_df: DataFrame) -> DataFrame:
    """Block-quantized perceptual hash over the opaque payload — the
    media analog of SimHash: the payload is cut into {PHASH_BITS}
    byte blocks and bit b is a quantized function of block b's byte
    mass ((Σ_block div 2) mod 2 — the second bit of the block sum).
    Identical media hash identically; an edit localized to one block
    flips at most that block's bit; unrelated payloads differ in ~half
    the bits (measured: this corpus' true byte-near-dups sit at
    Hamming ≤ 3 while everything else sits ≥ 8 — a block-MEAN bit,
    the photographic pHash rule, is non-discriminative on flat text
    payloads because every document's byte mass is near-uniform).
    Runs inside ``mapInPandas`` because
    this is the CODEC SEAM — a real pipeline computes pHash right
    after decode, per Arrow batch, never per-row Python. Emitted as a
    bit STRING (the dedup_simhash signature convention: banding and
    Hamming stay engine-portable, no 64-bit sign traps)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                n = len(b)
                blk = 1 + (n - 1) // PHASH_BITS if n else 1
                sums = [0] * PHASH_BITS
                for i, byte in enumerate(b):
                    sums[i // blk] += byte
                bits = "".join(str((s >> 1) & 1) for s in sums)
                ids.append(doc_id)
                hashes.append(bits)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="object"),
                }
            )

    return binary_df.mapInPandas(batches, _PHASH_SCHEMA)


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-duplicate pairs by perceptual hash: pHash signatures
    → {PHASH_BANDS}×{PHASH_BITS // PHASH_BANDS}-bit pigeonhole bands —
    any pair within Hamming ≤ {PHASH_MAX_HAMMING} = bands−1 shares at
    least one exact band, so the band equi-join has FULL recall at the
    radius — → exact per-bit Hamming filter. Exact-byte duplicates land at Hamming 0;
    re-encoded/lightly-edited media land within the radius — the
    screen exact md5 dedup (multimodal_dup_groups) cannot provide.

    Scale shape mirrors dedup_simhash_pairs: the only join is the
    band-key equi-join (bounded by band-bucket occupancy), never
    all-pairs; the payload itself never shuffles — only the 48-char
    signature does."""
    docs = load_table(spark, sf_dir, "documents")
    sig = phash_signatures(with_binary_content(docs))
    band_w = PHASH_BITS // PHASH_BANDS
    chunks = sig.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.substring(
                            "phash", c * band_w + 1, band_w
                        ).alias("key"),
                    )
                    for c in range(PHASH_BANDS)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "phash", "ck.chunk", "ck.key")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("h_a"),
            F.col("b.phash").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split("h_a", ""),
                F.split("h_b", ""),
                lambda x, y: x != y,
            ),
            lambda v: v,
        )
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


def _phash_oracle() -> str:
    band_w = PHASH_BITS // PHASH_BANDS
    bands_sql = " UNION ALL ".join(
        f"SELECT doc_id, phash, {c} AS chunk,"
        f" substr(phash, {c * band_w + 1}, {band_w}) AS key FROM sig"
        for c in range(PHASH_BANDS)
    )
    hamming_sql = " + ".join(
        f"(CASE WHEN substr(h_a, {i + 1}, 1) <> substr(h_b, {i + 1}, 1)"
        " THEN 1 ELSE 0 END)"
        for i in range(PHASH_BITS)
    )
    return f"""
WITH lens AS (
  -- byte-true twin of the Python side (which hashes raw UTF-8
  -- bytes): hex() the encoded blob and decode each byte from its two
  -- nibbles, so block size AND per-position values both index BYTES.
  -- (ascii(substring(text, i, 1)) would index CHARACTERS and return
  -- CODEPOINTS — divergent on any non-ASCII document.)
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n,
         1 + (octet_length(encode(text)) - 1) // {PHASH_BITS} AS blk
  FROM documents
),
pos AS (
  SELECT doc_id, hx, blk, unnest(range(1, n + 1)) AS i FROM lens
),
chars AS (
  SELECT doc_id,
         CAST((i - 1) // blk AS INT) AS b,
         (position(substring(hx, CAST(2 * i - 1 AS INT), 1)
                   IN '0123456789ABCDEF') - 1) * 16
         + (position(substring(hx, CAST(2 * i AS INT), 1)
                     IN '0123456789ABCDEF') - 1) AS v
  FROM pos
),
blocks AS (
  SELECT doc_id, b, SUM(v) AS s FROM chars GROUP BY 1, 2
),
spine AS (
  SELECT l.doc_id, g.b FROM lens l,
         generate_series(0, {PHASH_BITS - 1}) AS g(b)
),
sig AS (
  SELECT sp.doc_id,
         string_agg(
           CASE WHEN (CAST(COALESCE(bl.s, 0) AS BIGINT) // 2) % 2 = 1
                THEN '1' ELSE '0' END,
           '' ORDER BY sp.b) AS phash
  FROM spine sp
  LEFT JOIN blocks bl ON bl.doc_id = sp.doc_id AND bl.b = sp.b
  GROUP BY sp.doc_id
),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.phash AS h_a, y.phash AS h_b
  FROM bands x JOIN bands y
    ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST({hamming_sql} AS INT) AS hamming
FROM cand
WHERE {hamming_sql} <= {PHASH_MAX_HAMMING}
"""


register("multimodal_phash_neardup", _phash_oracle())(
    multimodal_phash_neardup
)


# ---------------------------------------------------------------------------
# Scene-cut detection (round 10)
# ---------------------------------------------------------------------------

SCENE_FRAME_BYTES = 64
SCENE_CUT_DELTA = 400  # byte-sum jump that starts a new scene


def frame_energy(binary_df: DataFrame) -> DataFrame:
    """Fixed-width framing + per-frame ENERGY (exact byte sum) over
    the opaque payload, Arrow-batched — the video twin of
    :func:`frame_activity`: a real pipeline decodes frames and scores
    luminance deltas here; the byte sum is the deterministic
    surrogate that keeps the downstream cut/segment logic under the
    hash gate."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                for f, off in enumerate(
                    range(0, len(b), SCENE_FRAME_BYTES)
                ):
                    chunk = b[off : off + SCENE_FRAME_BYTES]
                    rows.append((int(doc_id), f, sum(chunk)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_id", "energy"]
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        batches,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("frame_id", T.IntegerType()),
                T.StructField("energy", T.LongType()),
            ]
        ),
    )


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection end to end — the shot-boundary pass every
    video curation pipeline runs before sampling frames for training:
    frame the payload ({SCENE_FRAME_BYTES}-byte frames at the codec
    seam), score each frame's energy, open a NEW scene wherever the
    energy jumps by more than {SCENE_CUT_DELTA} vs the previous frame
    (LAG per doc), then roll consecutive frames into scenes with a
    running cut-count — per scene: frame span and exact total energy.

    Scale shape mirrors the VAD op: mapInPandas only for the per-byte
    codec work; cut detection and scene assembly are LAG + running
    SUM windows partitioned by doc_id; output is scene-count-sized
    (the payload never shuffles — only (doc, frame, energy) ints)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    frames = frame_energy(with_binary_content(docs))
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    cuts = frames.withColumn(
        "is_cut",
        F.when(
            F.abs(
                F.col("energy")
                - F.lag("energy").over(w)
            )
            > SCENE_CUT_DELTA,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    scenes = cuts.withColumn(
        "scene_id",
        F.sum("is_cut")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    return (
        scenes.groupBy("doc_id", "scene_id")
        .agg(
            F.min("frame_id").cast("int").alias("start_frame"),
            F.max("frame_id").cast("int").alias("end_frame"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.sum("energy").cast("bigint").alias("scene_energy"),
        )
    )


register(
    "multimodal_scene_cuts",
    f"""
WITH pos AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         unnest(range(1, octet_length(encode(text)) + 1)) AS i
  FROM documents
),
frames AS (
  SELECT doc_id,
         CAST((i - 1) // {SCENE_FRAME_BYTES} AS INT) AS frame_id,
         SUM((position(substring(hx, CAST(2 * i - 1 AS INT), 1)
                       IN '0123456789ABCDEF') - 1) * 16
             + (position(substring(hx, CAST(2 * i AS INT), 1)
                         IN '0123456789ABCDEF') - 1)) AS energy
  FROM pos GROUP BY 1, 2
),
cuts AS (
  SELECT doc_id, frame_id, energy,
         CASE WHEN abs(energy - lag(energy) OVER (
                PARTITION BY doc_id ORDER BY frame_id))
              > {SCENE_CUT_DELTA} THEN 1 ELSE 0 END AS is_cut
  FROM frames
),
scenes AS (
  SELECT doc_id, frame_id, energy,
         CAST(SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS INT) AS scene_id
  FROM cuts
)
SELECT doc_id, scene_id,
       CAST(MIN(frame_id) AS INT) AS start_frame,
       CAST(MAX(frame_id) AS INT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(energy) AS BIGINT) AS scene_energy
FROM scenes
GROUP BY 1, 2
""",
)(multimodal_scene_cuts)


def multimodal_dup_scenes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video DUPLICATE-SCENE detection — the reused-footage
    screen (shared intros/outros/stock clips) a video training
    pipeline runs so oversampled segments don't dominate a corpus
    that deduped only whole files (multimodal_dup_groups) or whole
    near-dups (multimodal_phash_neardup): two docs share a duplicate
    scene when a scene's exact fingerprint — (n_frames,
    scene_energy), the byte-exact length+content surrogate of a real
    pipeline's per-scene perceptual hash — matches across different
    docs. Composes the audited scene decomposition
    (multimodal_scene_cuts) and reports per doc pair the shared-scene
    count and their total energy; 1-frame scenes are excluded (too
    little content to call reuse).

    Scale shape: the only join is the fingerprint EQUI-join (bounded
    by fingerprint-bucket occupancy — never all-pairs), over the
    scene-count-sized rollup; payload bytes never shuffle. Oracle:
    composed verbatim from the scene-cut oracle (constituent fixes
    propagate)."""
    scenes = multimodal_scene_cuts(spark, sf_dir).filter(
        F.col("n_frames") >= 2
    )
    a = scenes.select(
        F.col("doc_id").alias("doc_a"),
        "n_frames",
        "scene_energy",
    )
    b = scenes.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_frames").alias("nf_b"),
        F.col("scene_energy").alias("se_b"),
    )
    pairs = a.join(
        b,
        (F.col("n_frames") == F.col("nf_b"))
        & (F.col("scene_energy") == F.col("se_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    )
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared_scenes"),
        F.sum("scene_energy").cast("bigint").alias("shared_energy"),
    )


def _dup_scenes_oracle() -> str:
    from smart_meter_data_pipeline_spark.plans.registry import ORACLES

    return f"""
WITH scenes AS ({ORACLES["multimodal_scene_cuts"]}),
kept AS (SELECT * FROM scenes WHERE n_frames >= 2)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_scenes,
       CAST(SUM(a.scene_energy) AS BIGINT) AS shared_energy
FROM kept a JOIN kept b
  ON a.n_frames = b.n_frames AND a.scene_energy = b.scene_energy
     AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


register("multimodal_dup_scenes", _dup_scenes_oracle())(
    multimodal_dup_scenes
)
