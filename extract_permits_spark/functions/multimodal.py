"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the Spark-native layout for 100 TB multimodal corpora (the binary stays in
parquet/ORC pages, metadata columns prune without touching payload bytes).

Decode / feature-extraction run as Arrow-batched ``mapInPandas`` — the
only sane shape for per-item Python work (codec libs aren't expressible in
SQL). In this container no image/audio libs exist, so the actual decode is
STUBBED: ``decode_stub_features`` computes real, deterministic
byte-level features (so the plumbing is testable end-to-end), and
``decode_image`` raises NotImplementedError where PIL/libav would be
called. The Spark-side contract — schemas, batch iteration, partition
behavior — is the real thing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: fake a media table from the documents fixture — text bytes
    become the opaque payload. Exercises the real binary-column path."""
    payload = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode an image payload to ``(width, height, channels, pixels)``.

    PNG decodes for real via the pure-stdlib codec
    (functions/png_codec.py — zlib inflate + per-row unfilter). Other
    formats (JPEG/WebP/...) need a codec library absent from this
    container; deployment swaps in PIL/libvips for those."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from extract_permits_spark.functions.png_codec import decode_png

        return decode_png(payload)
    raise NotImplementedError(
        "non-PNG image decode requires PIL/libvips, not present in this "
        "environment; swap this branch in deployment"
    )


def _features_batch(batch: "pd.DataFrame") -> "pd.DataFrame":
    import pandas as pd

    payloads = batch["payload"]
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "byte_mean": payloads.map(
                lambda b: round(sum(b) / len(b), 6) if len(b) else 0.0
            ),
            "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level feature extraction via mapInPandas.

    Arrow-batched: each Python worker sees pandas batches, never rows.
    The stand-in for decode→embed; the deployment version swaps
    ``_features_batch`` for a codec+model body with the same signature.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            yield _features_batch(b)

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("r_mean", T.DoubleType()),
        T.StructField("g_mean", T.DoubleType()),
        T.StructField("b_mean", T.DoubleType()),
    ]
)


def _synthetic_image_shape(media_id: int) -> tuple[int, int, int]:
    """Deterministic (width, height, channels) for the synthetic corpus.
    Shared contract with the mm_image_stats DuckDB oracle — change both
    together. Mix of RGB and RGBA exercises both 3- and 4-byte strides."""
    return (
        8 + (media_id % 5) * 4,
        8 + (media_id % 7) * 2,
        3 if media_id % 2 == 0 else 4,
    )


def _synthetic_pixels(media_id: int, width: int, height: int, channels: int) -> bytes:
    """Sample value at (x, y, c) = (media_id + 7x + 13y + 101c) mod 256 —
    closed-form, so the oracle recomputes expected channel sums in SQL
    without ever seeing a PNG byte. Vectorized broadcast (y, x, c)."""
    import numpy as np

    y = 13 * np.arange(height, dtype=np.int64)[:, None, None]
    x = 7 * np.arange(width, dtype=np.int64)[None, :, None]
    c = 101 * np.arange(channels, dtype=np.int64)[None, None, :]
    return ((media_id + y + x + c) % 256).astype(np.uint8).tobytes()


def _spread_ids(ids: DataFrame) -> DataFrame:
    """Round-robin the tiny id frame across the session's cores BEFORE
    the heavy encode/decode mapInPandas stages (r13 finding: the sf
    fixtures arrive as ONE parquet split, so the whole codec rail — the
    dominant cost of every multimodal entry — ran on one core;
    mm_video_shots measured 13.7 s where 32-way decode takes <1 s of
    CPU). Shuffling here is cheap by construction: the frame holds only
    ids (the binary payloads don't exist yet), and every downstream
    stage inherits the parallelism narrowly. At deployment scale real
    media arrives in many splits and this repartition is a no-op cost.
    Row placement does not affect values (all per-row functions), so
    hashes are unchanged."""
    sc = ids.sparkSession.sparkContext
    return ids.repartition(sc.defaultParallelism * 2)


def synthetic_png_media(docs: DataFrame) -> DataFrame:
    """One real PNG per document row: deterministic pixels encoded with
    the stdlib codec (filter types cycle per row, so a decode downstream
    exercises all five unfilter branches). Arrow-batched mapInPandas —
    the same worker-side shape a scrape-ingest decode job has."""
    from extract_permits_spark.functions.png_codec import encode_png

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            ids = b["media_id"].astype("int64")
            payloads, widths, heights = [], [], []
            for m in ids:
                w, h, ch = _synthetic_image_shape(int(m))
                payloads.append(encode_png(w, h, ch, _synthetic_pixels(int(m), w, h, ch)))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "mime": "image/png",
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "n_bytes": pd.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    flat = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    out = _spread_ids(
        docs.select(F.col("doc_id").alias("media_id"))
    ).mapInPandas(run, flat)
    return out.select(
        "media_id",
        "payload",
        F.struct("mime", "width", "height", "n_bytes").alias("meta"),
    )


DECODE_QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("err_kind", T.StringType()),
    ]
)

# The complete err_kind enum decode_quarantine can emit — downstream
# triage keys off this tuple, and a test pins classify() to it.
QUARANTINE_ERR_KINDS = (
    "truncated",
    "crc",
    "signature",
    "deflate",
    "unsupported",
    "empty",
    "other",
)


def decode_quarantine(media: DataFrame) -> DataFrame:
    """The ingest quarantine rail: attempt to decode every payload,
    emitting (media_id, ok, err_kind) instead of letting one corrupt blob
    kill the job — the per-item try/except a 100-TB scrape decode MUST
    have (a billion-payload scan will contain garbage). err_kind buckets
    the codec's loud ValueErrors into exactly ``QUARANTINE_ERR_KINDS``
    ('truncated', 'crc', 'signature', 'deflate', 'unsupported', 'empty',
    'other' — 'empty' marks NULL payloads, which are quarantine rows, not
    errors) so downstream can triage; ok rows carry NULL.
    Same Arrow-batched mapInPandas shape as image_stats; the codec's
    failure contract (ValueError for any malformed input — tested down to
    mid-CRC truncation) is what makes the rail total."""
    from extract_permits_spark.functions.png_codec import decode_png

    def classify(msg: str) -> str:
        m = msg.lower()
        if "truncated" in m:
            return "truncated"
        if "crc" in m:
            return "crc"
        if "signature" in m:
            return "signature"
        if "deflate" in m:
            return "deflate"
        if "unsupported" in m or "not supported" in m:
            return "unsupported"
        return "other"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            rows = []
            for m, payload in zip(b["media_id"], b["payload"]):
                if payload is None:
                    # a NULL blob is quarantine, not a TypeError — the
                    # rail must be total over anything a scan can yield
                    rows.append((int(m), False, "empty"))
                    continue
                try:
                    decode_png(bytes(payload))
                    rows.append((int(m), True, None))
                except ValueError as e:
                    rows.append((int(m), False, classify(str(e))))
            yield pd.DataFrame(rows, columns=["media_id", "ok", "err_kind"])

    return media.select("media_id", "payload").mapInPandas(
        run, DECODE_QUARANTINE_SCHEMA
    )


def image_stats(media: DataFrame) -> DataFrame:
    """Decode each PNG payload and emit per-image shape + channel means.

    Means are a single double division of exact integer sums — the
    cross-engine-deterministic form (see plans/analytics.py module doc).
    Runs as Arrow-batched mapInPandas over (media_id, payload) only, so
    column pruning keeps metadata out of the Python worker."""
    from extract_permits_spark.functions.png_codec import decode_png

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        import numpy as np

        for b in batches:
            rows = []
            for m, payload in zip(b["media_id"], b["payload"]):
                w, h, ch, px = decode_png(bytes(payload))
                n = w * h
                # exact int64 channel sums, vectorized over the pixel buffer
                lanes = np.frombuffer(px, dtype=np.uint8).reshape(-1, ch)
                if ch >= 3:
                    sums = [
                        int(s) for s in lanes[:, :3].sum(axis=0, dtype=np.int64)
                    ]
                else:
                    # grayscale / gray+alpha: the single luma lane stands in
                    # for r, g, and b (decode_png supports 1- and 2-channel
                    # PNGs; indexing lanes[:, :3] alone would IndexError)
                    g = int(lanes[:, 0].sum(dtype=np.int64))
                    sums = [g, g, g]
                rows.append(
                    (
                        int(m),
                        w,
                        h,
                        ch,
                        n,
                        sums[0] / n,
                        sums[1] / n,
                        sums[2] / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "n_pixels",
                    "r_mean",
                    "g_mean",
                    "b_mean",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("peak_amp", T.LongType()),
    ]
)


def _synthetic_audio_shape(media_id: int) -> tuple[int, int, int]:
    """Deterministic (sample_rate, channels, n_frames) — shared contract
    with the mm_audio_stats DuckDB oracle; change both together."""
    return (
        8000 + (media_id % 3) * 4000,
        1 + (media_id % 2),
        256 + (media_id % 7) * 64,
    )


def _synthetic_samples(media_id: int, n_samples: int) -> bytes:
    """Interleaved sample i = ((media_id*17 + i*31) mod 65536) - 32768 —
    closed-form so the oracle recomputes expected sums/peaks in SQL.
    Returns little-endian int16 bytes (what encode_wav consumes)."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    return (((media_id * 17 + i * 31) % 65536) - 32768).astype("<i2").tobytes()


def synthetic_wav_media(docs: DataFrame) -> DataFrame:
    """One real PCM WAV per document row, encoded with the stdlib RIFF
    codec. Same Arrow-batched mapInPandas shape as synthetic_png_media."""
    from extract_permits_spark.functions.wav_codec import encode_wav

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            ids = b["media_id"].astype("int64")
            payloads = []
            for m in ids:
                rate, ch, frames = _synthetic_audio_shape(int(m))
                payloads.append(
                    encode_wav(rate, ch, _synthetic_samples(int(m), frames * ch))
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "mime": "audio/wav",
                    "n_bytes": pd.array([len(p) for p in payloads], dtype="int64"),
                }
            )

    flat = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    return _spread_ids(
        docs.select(F.col("doc_id").alias("media_id"))
    ).mapInPandas(run, flat)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode each WAV payload and emit stream shape + amplitude stats.

    mean_amp / duration_ms are single double divisions of exact integer
    operands (cross-engine deterministic; numpy int64 accumulators keep
    the sums exact); peak is an integer max with an int32 upcast so
    abs(-32768) survives. Arrow-batched mapInPandas over
    (media_id, payload) only."""
    from extract_permits_spark.functions.wav_codec import decode_wav

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        import numpy as np

        for b in batches:
            rows = []
            for m, payload in zip(b["media_id"], b["payload"]):
                rate, ch, frames, pcm = decode_wav(bytes(payload))
                vals = np.frombuffer(pcm, dtype="<i2")
                n = frames * ch
                rows.append(
                    (
                        int(m),
                        rate,
                        ch,
                        frames,
                        frames * 1000 / rate,
                        int(vals.sum(dtype=np.int64)) / n,
                        int(np.abs(vals.astype(np.int32)).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "channels",
                    "n_frames",
                    "duration_ms",
                    "mean_amp",
                    "peak_amp",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, AUDIO_STATS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-frame-sampling *plan* shape: explode byte offsets as stand-in
    frame indices (real impl: pts timestamps from the container index).
    Shows the explode-then-process partition pattern without a codec."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.select(
        "media_id", F.explode(offsets).alias("frame_offset")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (dHash) image near-dup — connects the multimodal decode
# rail to the dedup rail: decode -> 9x8 grayscale-ish grid -> 64-bit
# difference hash -> banded Hamming join. The hash is built from EXACT
# integer comparisons (per-cell channel SUMS, never float means), so the
# DuckDB oracle replays it closed-form from the shared pixel formula
# without ever seeing a PNG byte — a hash match proves the whole
# encode -> deflate -> inflate -> unfilter -> sample -> pack chain.
# ---------------------------------------------------------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
    ]
)


def _phash_base(media_id: int) -> int:
    """Twin indirection: every ``media_id % 4 == 1`` image is a perturbed
    near-duplicate of ``media_id - 1`` (same shape, same base pixels, +3
    on the sparse diagonal lattice) so the fixture corpus always contains
    real near-dup pairs. Shared contract with the mm_image_phash oracle."""
    return media_id - 1 if media_id % 4 == 1 else media_id


def _phash_image_shape(media_id: int) -> tuple[int, int, int]:
    b = _phash_base(media_id)
    return (9 + (b % 4) * 5, 8 + (b % 3) * 6, 3 if b % 2 == 0 else 4)


def _phash_pixels(media_id: int, width: int, height: int, channels: int) -> bytes:
    """Pixel value at (x, y, c) — a per-image pattern whose offset
    (b² mod 251), x/y slopes (3 + b%5, 5 + b%7), and nonlinear cross term
    ((2 + b%11)·(x·y mod 13)) vary with the base id, so unrelated images
    land ~29 Hamming bits apart (0/500 sampled pairs within radius 7)
    while twins (media_id % 4 == 1: base pixels +3 where
    (x + y) % 11 == 0) stay within it (measured max 7 over the full codec
    chain). Closed-form — the oracle recomputes it in SQL."""
    import numpy as np

    b = _phash_base(media_id)
    y = (5 + b % 7) * np.arange(height, dtype=np.int64)[:, None, None]
    x = (3 + b % 5) * np.arange(width, dtype=np.int64)[None, :, None]
    c = 101 * np.arange(channels, dtype=np.int64)[None, None, :]
    xs = np.arange(width, dtype=np.int64)[None, :, None]
    ys = np.arange(height, dtype=np.int64)[:, None, None]
    v = (b * b) % 251 + y + x + c + (2 + b % 11) * ((xs * ys) % 13)
    if media_id % 4 == 1:
        v = v + 3 * (((xs + ys) % 11 == 0).astype(np.int64))
    return (v % 256).astype(np.uint8).tobytes()


def synthetic_phash_media(docs: DataFrame) -> DataFrame:
    """One real PNG per document for the phash rail (widths ≥ 9 so the
    9-column dHash grid always has a sample point; every 4th image a
    perturbed twin of its predecessor). Same Arrow-batched shape as
    synthetic_png_media."""
    from extract_permits_spark.functions.png_codec import encode_png

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            ids = b["media_id"].astype("int64")
            payloads = []
            for m in ids:
                w, h, ch = _phash_image_shape(int(m))
                payloads.append(
                    encode_png(w, h, ch, _phash_pixels(int(m), w, h, ch))
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    flat = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return _spread_ids(
        docs.select(F.col("doc_id").alias("media_id"))
    ).mapInPandas(run, flat)


def dhash64(width: int, height: int, channels: int, pixels: bytes) -> tuple[int, int]:
    """64-bit dHash from decoded pixels, split (hi, lo) into two unsigned
    32-bit halves (avoids BIGINT sign games in both engines).

    Grid: nearest-neighbor sample at sx = ((2gx+1)·w)//18 (gx 0..8),
    sy = ((2gy+1)·h)//16 (gy 0..7); cell value = exact integer channel
    sum; bit(gx, gy) = g[gx+1] > g[gx]; bit index k = gy·8 + gx. All
    integer arithmetic — bit-identical across engines by construction."""
    import numpy as np

    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.int64)
    )
    sx = [((2 * gx + 1) * width) // 18 for gx in range(9)]
    sy = [((2 * gy + 1) * height) // 16 for gy in range(8)]
    g = arr[np.ix_(sy, sx)].sum(axis=2)  # (8 rows=gy, 9 cols=gx)
    bits = (g[:, 1:] > g[:, :-1]).flatten()  # k = gy*8 + gx
    word = 0
    for k in range(64):
        if bits[k]:
            word |= 1 << k
    return word >> 32, word & 0xFFFFFFFF


def phash64(media: DataFrame) -> DataFrame:
    """Decode every PNG payload and emit its dHash as (media_id, hi, lo).
    Arrow-batched mapInPandas over (media_id, payload) only — metadata
    pruned out of the Python worker, narrow (no shuffle)."""
    from extract_permits_spark.functions.png_codec import decode_png

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            rows = []
            for m, payload in zip(b["media_id"], b["payload"]):
                w, h, ch, px = decode_png(bytes(payload))
                hi, lo = dhash64(w, h, ch, px)
                rows.append((int(m), hi, lo))
            yield pd.DataFrame(rows, columns=["media_id", "hi", "lo"])

    return media.select("media_id", "payload").mapInPandas(run, PHASH_SCHEMA)


def hamming_band_rows(hashes: DataFrame) -> DataFrame:
    """Explode 64-bit (hi, lo) hashes into 8 (t, v) 8-bit band rows with
    the hash carried — the LSH decomposition shared by the batch pair
    join (phash_pairs) and the streaming ingest probe (stream image
    dedup): Hamming ≤ 7 over 64 bits forces ≥ 1 exact band match."""
    bands = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.shiftright(F.col("lo") if t < 4 else F.col("hi"), 8 * (t % 4))
                .bitwiseAND(F.lit(255))
                .alias("v"),
            )
            for t in range(8)
        ]
    )
    return hashes.select(
        "media_id", "hi", "lo", F.explode(bands).alias("band")
    ).select(
        "media_id", "hi", "lo", F.col("band.t").alias("t"), F.col("band.v").alias("v")
    )


def phash_pairs(
    hashes: DataFrame,
    max_hamming: int = 7,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Banded Hamming self-join over dHashes: 8 bands of 8 bits, candidate
    pairs share an exact band value, verified by full Hamming distance.
    Pigeonhole-complete at the radius: hamming ≤ 7 over 64 bits forces at
    least one of the 8 bands to match exactly, so no true pair is missed.

    Scale: an equi-join on (band_index, band_value) — never an all-pairs
    product (plan-tested). ``max_bucket_size`` is the same throughput
    triage as candidate_pairs_from_buckets (similarity.py): a band value
    shared by more than that many images is degenerate content; every
    fixture bucket is far smaller, so the oracle's pairwise replay is
    identical there.

    The hash frame is materialized ONCE (r13): the banded self-join
    references it structurally 4× (counts + cap join + both join
    sides), and each un-materialized reference re-ran the whole decode
    rail — measured 4.1 s of a 5.8 s row was codec recompute. The
    checkpointed frame is (id, hi, lo) — tiny at any corpus scale —
    and is registered for scratch reclamation like similarity's
    signature triples. r15d: the checkpoint is LAZY (eager=False, the
    r15b minhash shape) — one DAG, no job barrier between the decode
    rail and the join; references past the first read the persisted
    partitions. Measured 4.85 → 3.98 s (mm_image_phash) and
    5.16 → 4.48 s (mm_audio_fingerprint) at sf0.1, values unchanged."""
    from extract_permits_spark.session import register_scratch_checkpoint

    hashes = hashes.localCheckpoint(eager=False)
    register_scratch_checkpoint(hashes)
    exploded = hamming_band_rows(hashes)
    counts = exploded.groupBy("t", "v").agg(F.count(F.lit(1)).alias("_n"))
    capped = exploded.join(
        counts.where(F.col("_n") <= max_bucket_size), ["t", "v"]
    ).drop("_n")
    a = capped.select(
        "t", "v",
        F.col("media_id").alias("id_a"),
        F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"),
    )
    b = capped.select(
        "t", "v",
        F.col("media_id").alias("id_b"),
        F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"),
    )
    cand = (
        a.join(b, ["t", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "hi_a", "lo_a", "id_b", "hi_b", "lo_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup — the WAV twin of the phash rail: decode ->
# 65-frame energy profile -> 64-bit difference fingerprint -> the SAME
# banded Hamming join (phash_pairs works on any (media_id, hi, lo)).
# Exact integer energies, closed-form oracle.
# ---------------------------------------------------------------------------


def _audiofp_base(media_id: int) -> int:
    """Twin indirection, same convention as _phash_base: every
    ``media_id % 4 == 1`` clip is a +40-on-sparse-lattice perturbation of
    ``media_id - 1`` (twin fingerprints measured ≤ 1 Hamming bit over the
    full codec chain; unrelated clips ~31)."""
    return media_id - 1 if media_id % 4 == 1 else media_id


def _audiofp_n(media_id: int) -> int:
    b = _audiofp_base(media_id)
    return 960 + (b % 5) * 320


def _audiofp_samples(media_id: int) -> bytes:
    """Mono int16 PCM, sample i = ((b² mod 1009)·13 + (7 + b%13)·31·i +
    (3 + b%5)·(i² mod 97)) mod 65536 − 32768 — offset, slope, and a
    nonlinear term all vary with the base id so unrelated clips'
    fingerprints are far apart; twins add +40 where i % 17 == 0.
    Closed-form — the oracle recomputes it in SQL."""
    import numpy as np

    b = _audiofp_base(media_id)
    n = _audiofp_n(media_id)
    i = np.arange(n, dtype=np.int64)
    x = (b * b % 1009) * 13 + (7 + b % 13) * i * 31 + (3 + b % 5) * ((i * i) % 97)
    if media_id % 4 == 1:
        x = x + 40 * ((i % 17 == 0).astype(np.int64))
    return (x % 65536 - 32768).astype("<i2").tobytes()


def synthetic_audiofp_media(docs: DataFrame) -> DataFrame:
    """One real mono PCM WAV per document for the fingerprint rail."""
    from extract_permits_spark.functions.wav_codec import encode_wav

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            ids = b["media_id"].astype("int64")
            payloads = [
                encode_wav(8000, 1, _audiofp_samples(int(m))) for m in ids
            ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    flat = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return _spread_ids(
        docs.select(F.col("doc_id").alias("media_id"))
    ).mapInPandas(run, flat)


def audiofp64(media: DataFrame) -> DataFrame:
    """Decode each WAV payload and emit a 64-bit energy-difference
    fingerprint as (media_id, hi, lo): samples map to 65 frames by
    f = (i·65)//n, frame energy = exact Σ|sample| (integer), bit k =
    E[k+1] > E[k]. All integer arithmetic — bit-identical across
    engines. Narrow Arrow-batched mapInPandas, like phash64."""
    from extract_permits_spark.functions.wav_codec import decode_wav

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        import numpy as np

        for b in batches:
            rows = []
            for m, payload in zip(b["media_id"], b["payload"]):
                _rate, ch, n_frames, pcm = decode_wav(bytes(payload))
                s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                n = n_frames * ch
                f = (np.arange(n, dtype=np.int64) * 65) // n
                en = np.bincount(
                    f, weights=np.abs(s), minlength=65
                ).astype(np.int64)
                bits = en[1:] > en[:-1]
                word = 0
                for k in range(64):
                    if bits[k]:
                        word |= 1 << k
                rows.append((int(m), word >> 32, word & 0xFFFFFFFF))
            yield pd.DataFrame(rows, columns=["media_id", "hi", "lo"])

    return media.select("media_id", "payload").mapInPandas(run, PHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Video shot-boundary detection — the third computed multimodal rail:
# per-frame PNG decode -> dHash -> consecutive-frame Hamming distance;
# a cut is a distance above the radius. Scenes are far apart by
# construction (base id jumps 37·scene), within-scene frames differ by
# an alternating sparse perturbation (measured: in-scene ≤ 6 bits,
# cuts ≥ 10 over 400 videos × 7 transitions).
# ---------------------------------------------------------------------------

VIDEO_W, VIDEO_H, VIDEO_CH = 16, 16, 3
VIDEO_FRAMES = 8


def _video_scene(media_id: int, frame_idx: int) -> int:
    """Scene index: cuts at 2 + m%3 and 5 + m%2 (two cuts per video,
    positions vary by id). Shared contract with the mm_video_shots
    oracle."""
    c1 = 2 + media_id % 3
    c2 = 5 + media_id % 2
    return 0 if frame_idx < c1 else (1 if frame_idx < c2 else 2)


def _video_frame_pixels(media_id: int, frame_idx: int) -> bytes:
    """Frame pixels: the phash gradient family with base
    b = m·97 + scene·37 (scene changes scramble every residue) plus an
    alternating +3 sparse perturbation within a scene (frame motion)."""
    import numpy as np

    s = _video_scene(media_id, frame_idx)
    b = media_id * 97 + s * 37
    y = (5 + b % 7) * np.arange(VIDEO_H, dtype=np.int64)[:, None, None]
    x = (3 + b % 5) * np.arange(VIDEO_W, dtype=np.int64)[None, :, None]
    c = 101 * np.arange(VIDEO_CH, dtype=np.int64)[None, None, :]
    xs = np.arange(VIDEO_W, dtype=np.int64)[None, :, None]
    ys = np.arange(VIDEO_H, dtype=np.int64)[:, None, None]
    v = (b * b) % 251 + y + x + c + (2 + b % 11) * ((xs * ys) % 13)
    v = v + 3 * (((xs + ys) % 11 == 0).astype(np.int64)) * (frame_idx % 2)
    return (v % 256).astype(np.uint8).tobytes()


def synthetic_video_frames(docs: DataFrame) -> DataFrame:
    """8 real PNG frames per document — (media_id, frame_idx, payload).
    The frame explode happens Spark-side (sequence + explode) so the
    Python worker only encodes its own partition's frames."""
    from extract_permits_spark.functions.png_codec import encode_png

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            payloads = [
                encode_png(
                    VIDEO_W, VIDEO_H, VIDEO_CH,
                    _video_frame_pixels(int(m), int(f)),
                )
                for m, f in zip(b["media_id"], b["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].astype("int64"),
                    "frame_idx": b["frame_idx"].astype("int64"),
                    "payload": payloads,
                }
            )

    flat = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.explode(F.sequence(F.lit(0), F.lit(VIDEO_FRAMES - 1))).alias(
            "frame_idx"
        ),
    )
    return _spread_ids(base).mapInPandas(run, flat)


VIDEOHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
    ]
)


def videohash64(frames: DataFrame) -> DataFrame:
    """Decode each frame PNG and emit its dHash keyed by
    (media_id, frame_idx) — same narrow Arrow shape as phash64."""
    from extract_permits_spark.functions.png_codec import decode_png

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            rows = []
            for m, f, payload in zip(
                b["media_id"], b["frame_idx"], b["payload"]
            ):
                w, h, ch, px = decode_png(bytes(payload))
                hi, lo = dhash64(w, h, ch, px)
                rows.append((int(m), int(f), hi, lo))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "hi", "lo"]
            )

    return frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, VIDEOHASH_SCHEMA
    )


def video_shot_cuts(hashes: DataFrame, max_hamming: int = 7) -> DataFrame:
    """(media_id, frame_idx, hamming, is_cut) for every frame transition:
    one bounded lag window per video (partitioned by media_id — 8 rows
    per partition key, never global), cut iff consecutive-frame Hamming
    exceeds the radius."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev_hi = F.lag("hi").over(w)
    prev_lo = F.lag("lo").over(w)
    hamming = (
        F.bit_count(F.col("hi").bitwiseXOR(prev_hi))
        + F.bit_count(F.col("lo").bitwiseXOR(prev_lo))
    ).cast("long")
    return (
        hashes.select(
            "media_id", "frame_idx", hamming.alias("hamming")
        )
        .where(F.col("hamming").isNotNull())
        .withColumn("is_cut", F.col("hamming") > max_hamming)
    )
