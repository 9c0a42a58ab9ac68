"""Unit tests for text analysis + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extract_permits_spark.functions import multimodal as mm
from extract_permits_spark.functions import text as tx


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark):
    df = _docs(spark, [(1, "one two  three"), (2, ""), (3, None), (4, "  x  ")])
    out = {r["doc_id"]: (r["n"], r["c"], r["b"]) for r in df.select(
        "doc_id",
        tx.token_count("text").alias("n"),
        tx.char_count("text").alias("c"),
        tx.bpe_token_estimate("text").alias("b"),
    ).collect()}
    assert out[1] == (3, 14, 4)  # double space collapses in split
    assert out[2] == (0, 0, 0)
    assert out[3] == (0, 0, 0)
    assert out[4][0] == 1


def test_quality_ratios(spark):
    df = _docs(spark, [(1, "the cat"), (2, "zz!!"), (3, None)])
    r = {x["doc_id"]: x for x in df.select(
        "doc_id",
        tx.alpha_ratio("text").alias("alpha"),
        tx.stopword_ratio("text").alias("stop"),
        tx.mean_word_length("text").alias("mwl"),
    ).collect()}
    assert r[1]["alpha"] == round(6 / 7, 6)
    assert r[1]["stop"] == 0.5  # 'the' of 2 tokens
    assert r[1]["mwl"] == 3.0
    assert r[2]["stop"] == 0.0
    assert r[3]["alpha"] == 0.0


def test_language_id(spark):
    df = _docs(spark, [
        (1, "the cat and the dog is that"),
        (2, "der hund und die katze ist nicht"),
        (3, "le chat et la maison est les"),
        (4, "xyzzy qwerty"),
    ])
    out = {r["doc_id"]: r["l"] for r in df.select(
        "doc_id", tx.language_id("text").alias("l")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"


def test_fingerprint_normalization(spark):
    df = _docs(spark, [(1, "Hello,   World!"), (2, "hello world"), (3, "different")])
    out = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", tx.fingerprint("text").alias("f")).collect()}
    assert out[1] == out[2]  # punctuation/case-insensitive
    assert out[1] != out[3]


def test_media_features_roundtrip(spark):
    df = _docs(spark, [(1, "abc"), (2, "")])
    media = mm.documents_as_media(df)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert feats[1]["n_bytes"] == 3
    assert feats[1]["head_hex"] == b"abc".hex()
    assert feats[1]["byte_mean"] == round((97 + 98 + 99) / 3, 6)
    assert feats[2]["n_bytes"] == 0 and feats[2]["byte_mean"] == 0.0


def test_decode_image_non_png_is_env_gated():
    # PNG decodes for real (png_codec); anything else — including a
    # truncated PNG prefix that fails the 8-byte signature — stays an
    # explicit NotImplementedError environment gate, never silent.
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")  # not the full signature
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff\xe0")  # JPEG


def test_frame_sample_plan(spark):
    df = _docs(spark, [(1, "x" * 3000)])
    media = mm.documents_as_media(df)
    offs = [r["frame_offset"] for r in mm.frame_sample_plan(media, 1024).collect()]
    assert offs == [0, 1024, 2048]


def test_clean_for_pretraining(spark):
    df = _docs(spark, [
        (1, "see https://example.com/x?q=1 and mail a@b.com or 312-555-1234  now"),
        (2, None),
    ])
    out = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", tx.clean_for_pretraining("text").alias("c")).collect()}
    assert out[1] == "see and mail <EMAIL> or <PHONE> now"
    assert out[2] == ""


def test_chunk_documents_edges(spark):
    from extract_permits_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(100))),  # 100 tokens -> 3 chunks
            (2, "a b c"),  # short: one 3-token chunk
            (3, ""),  # empty: no rows
            (4, None),  # null: no rows
            (5, "x " * 64),  # exactly 64: one chunk, no overlap spill
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: starts at 1 and 49 (start 97 would be a pure suffix retread
    # of chunk@49, which already reaches token 100) -> chunks of 64, 52
    assert [rows[(1, i)]["n_tokens"] for i in range(2)] == [64, 52]
    assert (1, 2) not in rows
    # full coverage: chunk@49 ends at the last token
    assert rows[(1, 1)]["chunk_text"].split()[-1] == "w99"
    # overlap: chunk 1 starts at token 49, i.e. repeats tokens 49..64 (w48..w63)
    assert rows[(1, 1)]["chunk_text"].split()[0] == "w48"
    assert rows[(1, 0)]["chunk_text"].split()[-1] == "w63"
    assert rows[(2, 0)]["n_tokens"] == 3
    assert not any(d in (3, 4) for (d, _) in rows)
    assert rows[(5, 0)]["n_tokens"] == 64
    assert (5, 1) not in rows
    with __import__("pytest").raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=16, overlap=16)


def test_pii_redaction_positive_path(spark):
    """The registry entry runs over a PII-free corpus (false-positive
    check); this pins the positive path with planted PII."""
    from extract_permits_spark.plans.analytics import redact_pii

    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk for details"),
        (2, "server at 192.168.1.254 went down, call +1 (312) 555-0199"),
        (3, "no pii here at all"),
        (4, "a@b.io and c.d@e-f.org in one line"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}

    assert out[1]["n_pii"] == 1
    assert out[1]["text"] == "contact me at [EMAIL] for details"
    assert out[2]["n_pii"] == 2
    assert "[IP]" in out[2]["text"] and "[PHONE]" in out[2]["text"]
    assert "192.168" not in out[2]["text"] and "555" not in out[2]["text"]
    assert out[3]["n_pii"] == 0 and out[3]["text"] == "no pii here at all"
    assert out[4]["n_pii"] == 2
    assert out[4]["text"] == "[EMAIL] and [EMAIL] in one line"
    assert out[5]["n_pii"] is None and out[5]["text"] is None


def test_pii_redaction_no_udf(spark):
    """Redaction must stay codegen'd (regexp expressions, no Python)."""
    from extract_permits_spark.plans.analytics import redact_pii

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = redact_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_words_udtf(spark):
    """UDTF (row-at-a-time Python, the documented slow path): SQL-callable
    table function with lateral join; semantics mirror the production
    posexplode chunker."""
    from extract_permits_spark.functions.udtfs import ChunkWords, register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_words('a b c d e f g', 3, 1)"
    ).collect()
    got = [(r["chunk_id"], r["start"], r["chunk"]) for r in rows]
    assert got == [(0, 0, "a b c"), (1, 2, "c d e"), (2, 4, "e f g")]

    # lateral join over a table: one UDTF call per input row
    df = spark.createDataFrame([(1, "x y z w"), (2, None)], ["doc_id", "text"])
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT doc_id, chunk_id, chunk FROM udtf_docs, "
        "LATERAL chunk_words(text, 2, 0)"
    ).collect()
    assert [(r["doc_id"], r["chunk_id"], r["chunk"]) for r in out] == [
        (1, 0, "x y"),
        (1, 1, "z w"),
    ]


# ---------------------------------------------------------------------------
# BPE encoder (functions/bpe.py)
# ---------------------------------------------------------------------------


def test_bpe_encode_word_hand_computed():
    from extract_permits_spark.functions.bpe import bpe_encode_word

    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("d", "e"): 2}
    assert bpe_encode_word("abc", ranks) == ["abc"]
    assert bpe_encode_word("cab", ranks) == ["c", "ab"]
    assert bpe_encode_word("abcabc", ranks) == ["abc", "abc"]
    assert bpe_encode_word("deab", ranks) == ["de", "ab"]
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe_encode_word("a", ranks) == ["a"]
    assert bpe_encode_word("", ranks) == []


def test_bpe_encode_priority_beats_position():
    from extract_permits_spark.functions.bpe import bpe_encode_word

    # ("b","c") has LOWER rank than ("a","b"): in "abc" the rank-priority
    # encoder must merge bc first even though ab appears first
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe_encode_word("abc", ranks) == ["a", "bc"]


def test_bpe_encode_words_mapinpandas(spark):
    from pyspark.sql import functions as F

    from extract_permits_spark.functions.bpe import bpe_encode_word, encode_words

    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    df = spark.createDataFrame(
        [("low",), ("lower",), ("lowest",), ("slow",)], ["word"]
    )
    got = {r["word"]: list(r["tokens"]) for r in encode_words(df, merges).collect()}
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ("low", "lower", "lowest", "slow"):
        assert got[w] == bpe_encode_word(w, ranks)
        assert "".join(got[w]) == w  # lossless
    # plan: Arrow-batched, not row-pickled
    plan = (
        encode_words(df, merges)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan


# ---------------------------------------------------------------------------
# PNG codec: the executable image-decode slice of the multimodal path
# ---------------------------------------------------------------------------


def test_png_roundtrip_exercises_all_filter_types():
    import random

    from extract_permits_spark.functions.png_codec import decode_png, encode_png

    rng = random.Random(7)
    for channels in (1, 2, 3, 4):
        w, h = 13, 9  # h > 4 rows => encoder's cycle hits all 5 filters
        px = bytes(rng.randrange(256) for _ in range(w * h * channels))
        back_w, back_h, back_ch, back_px = decode_png(encode_png(w, h, channels, px))
        assert (back_w, back_h, back_ch) == (w, h, channels)
        assert back_px == px  # bit-exact through filter+deflate


def test_png_corrupt_and_unsupported_are_loud():
    import pytest

    from extract_permits_spark.functions.png_codec import decode_png, encode_png

    good = encode_png(4, 4, 3, bytes(range(48)))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IHDR/IDAT body -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))


def test_png_zero_dimension_rejected_both_ways():
    """r8 ADVICE: a 0x0 image reaching image_stats would divide by
    n = w*h = 0 in the worker. The codec now rejects zero dimensions at
    both ends (PNG spec: zero width/height is invalid), so the stats
    kernel never sees one."""
    import struct
    import zlib

    import pytest

    from extract_permits_spark.functions.png_codec import decode_png, encode_png

    with pytest.raises(ValueError, match="zero dimension"):
        encode_png(0, 4, 3, b"")
    with pytest.raises(ValueError, match="zero dimension"):
        encode_png(4, 0, 3, b"")

    # hand-build a structurally valid 0x0 PNG (encode_png refuses to)
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 0, 0, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b""))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="zero dimension"):
        decode_png(payload)


def test_decode_image_dispatches_png_and_stays_loud_otherwise():
    import pytest

    from extract_permits_spark.functions.multimodal import decode_image
    from extract_permits_spark.functions.png_codec import encode_png

    w, h, ch, px = decode_image(encode_png(5, 3, 4, bytes(range(60))))
    assert (w, h, ch) == (5, 3, 4) and px == bytes(range(60))
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_image_stats_plan_is_narrow_arrow_batched(spark):
    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.sources.readers import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 20
    )
    stats = mmfn.image_stats(mmfn.synthetic_png_media(docs))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2  # encode stage + decode stage
    # exactly ONE exchange: the deliberate r13 id-spread below the
    # encode (ids only — it sits under the first MapInPandas, so no
    # payload byte ever shuffles); the decode stays embarrassingly
    # parallel above it
    assert plan.count("Exchange") == 1
    assert "RoundRobinPartitioning" in plan
    assert plan.index("Exchange") > plan.index("MapInPandas")
    rows = {r["media_id"]: r for r in stats.collect()}
    assert len(rows) == 20
    # spot-check one image against the closed-form pixel formula
    m = sorted(rows)[0]
    w, h, ch = mmfn._synthetic_image_shape(m)
    r = rows[m]
    assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
    exp = sum((m + 7 * x + 13 * y) % 256 for x in range(w) for y in range(h)) / (w * h)
    assert r["r_mean"] == exp


def test_wav_roundtrip_and_loud_failures():
    import pytest

    from extract_permits_spark.functions.wav_codec import decode_wav, encode_wav

    samples = [((i * 37) % 65536) - 32768 for i in range(300 * 2)]
    payload = encode_wav(12000, 2, samples)
    rate, ch, frames, pcm = decode_wav(payload)
    assert (rate, ch, frames) == (12000, 2, 300)
    import struct

    assert list(struct.unpack("<600h", pcm)) == samples
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + payload)
    # float-PCM format tag must refuse, not decode garbage
    bad = bytearray(payload)
    bad[20] = 3  # fmt audio_format field: 1 (PCM) -> 3 (IEEE float)
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(bad))


def test_audio_stats_matches_formula(spark):
    from pyspark.sql import functions as F

    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 10
    )
    stats = mmfn.audio_stats(mmfn.synthetic_wav_media(docs))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2
    # one exchange only: the id-spread below the encode (see the image
    # twin test for the r13 contract)
    assert plan.count("Exchange") == 1 and "RoundRobinPartitioning" in plan
    rows = {r["media_id"]: r for r in stats.collect()}
    m = sorted(rows)[0]
    import struct

    rate, ch, frames = mmfn._synthetic_audio_shape(m)
    raw = mmfn._synthetic_samples(m, frames * ch)
    vals = struct.unpack(f"<{frames * ch}h", raw)
    r = rows[m]
    assert (r["sample_rate"], r["channels"], r["n_frames"]) == (rate, ch, frames)
    assert r["mean_amp"] == sum(vals) / len(vals)
    assert r["peak_amp"] == max(abs(v) for v in vals)
    assert r["duration_ms"] == frames * 1000 / rate


def test_delta_probe_is_honest_gate():
    import pytest

    from extract_permits_spark.sinks import delta_io

    if delta_io.delta_available():  # deployment environment
        pytest.skip("delta-spark present; gate not exercised")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        delta_io.write_delta(None, "/tmp/nowhere")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        delta_io.read_delta(None, "/tmp/nowhere")


# ---------------------------------------------------------------------------
# Codec property tests (hypothesis): any image/stream shape round-trips
# ---------------------------------------------------------------------------


def test_png_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from extract_permits_spark.functions.png_codec import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(w, h, ch, seed):
        import random

        px = bytes(random.Random(seed).randrange(256) for _ in range(w * h * ch))
        assert decode_png(encode_png(w, h, ch, px)) == (w, h, ch, px)

    inner()


def test_wav_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from extract_permits_spark.functions.wav_codec import decode_wav, encode_wav

    @settings(max_examples=40, deadline=None)
    @given(
        rate=st.sampled_from([8000, 16000, 44100]),
        ch=st.integers(1, 8),
        frames=st.integers(1, 200),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(rate, ch, frames, seed):
        import random
        import struct

        vals = [
            random.Random(seed + i).randrange(-32768, 32768)
            for i in range(frames * ch)
        ]
        r, c, f, pcm = decode_wav(encode_wav(rate, ch, vals))
        assert (r, c, f) == (rate, ch, frames)
        assert list(struct.unpack(f"<{frames * ch}h", pcm)) == vals

    inner()


def test_png_truncated_chunk_raises_valueerror_not_struct_error():
    """A payload cut mid chunk-header or mid-CRC must raise ValueError —
    the documented quarantine contract — never struct.error (ADVICE r7)."""
    import pytest

    from extract_permits_spark.functions.png_codec import decode_png, encode_png

    good = encode_png(4, 4, 3, bytes(range(48)))
    for cut in (10, 14, len(good) - 3):  # mid-header, mid-body, mid-CRC
        with pytest.raises(ValueError, match="truncated"):
            decode_png(good[:cut])


def test_wav_truncated_payload_raises_valueerror():
    import pytest

    from extract_permits_spark.functions.wav_codec import decode_wav, encode_wav

    good = encode_wav(8000, 1, [0, 100, -100, 32767])
    for cut in (13, 25, len(good) - 1):
        with pytest.raises(ValueError):
            decode_wav(good[:cut])


def test_image_stats_handles_grayscale_and_gray_alpha(spark):
    """decode_png supports 1- and 2-channel PNGs; image_stats must not
    IndexError on them (ADVICE r7 medium) — the luma lane stands in for
    r, g and b means."""
    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.functions.png_codec import encode_png

    w, h = 6, 4
    gray = bytes((3 * i) % 256 for i in range(w * h))
    ga = bytes((5 * i) % 256 for i in range(w * h * 2))
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(w, h, 1, gray))),
         (2, bytearray(encode_png(w, h, 2, ga)))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in mmfn.image_stats(media).collect()}
    exp1 = sum(gray) / (w * h)
    exp2 = sum(ga[0::2]) / (w * h)  # channel 0 is luma, 1 is alpha
    assert rows[1]["channels"] == 1
    assert rows[1]["r_mean"] == rows[1]["g_mean"] == rows[1]["b_mean"] == exp1
    assert rows[2]["channels"] == 2
    assert rows[2]["r_mean"] == rows[2]["g_mean"] == rows[2]["b_mean"] == exp2


def test_word_ngrams_matches_python_reference(spark):
    """Pins the r9 zip-slices rewrite of _word_ngrams to the obvious
    Python construction: ordered, overlapping, duplicates KEPT (unlike
    word_shingles), empty below n tokens."""
    from pyspark.sql import functions as F

    from extract_permits_spark.functions.text import _word_ngrams

    texts = [
        "a b c d e f g",
        "x x x x x x",  # duplicate grams must be kept
        "one two three four",  # exactly n-1 below a 5-gram
        "one two three four five",  # exactly one 5-gram
        "solo",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: r["g"]
        for r in df.select(
            "i", _word_ngrams(F.split(F.col("t"), " "), 5).alias("g")
        ).collect()
    }

    def ref(t: str, n: int = 5) -> list[str]:
        toks = t.split(" ")
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    for i, t in enumerate(texts):
        assert got[i] == ref(t), (t, got[i])


def test_decode_quarantine_buckets(spark):
    """The rail is total: good PNG -> ok; truncated -> 'truncated';
    flipped byte -> 'crc'; bad signature -> 'signature'; NULL -> 'empty'.
    No input may kill the task."""
    from extract_permits_spark.functions.multimodal import decode_quarantine
    from extract_permits_spark.functions.png_codec import encode_png

    good = encode_png(4, 4, 3, bytes(range(48)))
    flipped = bytearray(good)
    flipped[40] ^= 0xFF
    rows = [
        (1, good),
        (2, good[:-5]),
        (3, bytes(flipped)),
        (4, b"JFIF" + good),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (r["ok"], r["err_kind"])
        for r in decode_quarantine(df).collect()
    }
    assert got == {
        1: (True, None),
        2: (False, "truncated"),
        3: (False, "crc"),
        4: (False, "signature"),
        5: (False, "empty"),
    }
    # every emitted bucket is in the documented enum (r9 advice: the
    # docstring once omitted 'deflate'/'empty'; the constant is the
    # contract now)
    from extract_permits_spark.functions.multimodal import (
        QUARANTINE_ERR_KINDS,
    )

    emitted = {k for _, k in got.values() if k is not None}
    assert emitted <= set(QUARANTINE_ERR_KINDS)


def test_png_crc_consistent_corruption_still_valueerror():
    """r9 review finding: malformed payloads whose CRCs are self-consistent
    (a buggy encoder computed them over the garbage) must STILL raise
    ValueError, never zlib.error or struct.error — the quarantine rail's
    totality depends on it."""
    import struct
    import zlib

    import pytest

    from extract_permits_spark.functions.png_codec import decode_png

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    # garbage IDAT, CRC computed over the garbage -> inflate fails
    bad_idat = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"\x01\x02\x03") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="deflate"):
        decode_png(bad_idat)

    # IHDR body of the wrong length, CRC consistent -> length check fires
    bad_ihdr = sig + chunk(b"IHDR", ihdr[:-1]) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(bad_ihdr)


def test_phash_twin_within_radius_and_nontwins_far():
    """The full codec chain (encode -> decode -> dhash) keeps every
    perturbed twin within Hamming radius 7 while unrelated images stay
    far outside it — the contract the banded join's radius relies on."""
    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.functions.png_codec import decode_png, encode_png

    def h(m):
        w, hh, ch = mmfn._phash_image_shape(m)
        px = mmfn._phash_pixels(m, w, hh, ch)
        w2, h2, c2, px2 = decode_png(encode_png(w, hh, ch, px))
        assert (w2, h2, c2) == (w, hh, ch) and px2 == px
        hi, lo = mmfn.dhash64(w2, h2, c2, px2)
        assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32
        return (hi << 32) | lo

    def ham(a, b):
        return bin(a ^ b).count("1")

    twins = [ham(h(m), h(m - 1)) for m in range(1, 120, 4)]
    assert max(twins) <= 7
    others = [ham(h(a), h(a + 2)) for a in range(0, 100, 4)]
    assert min(others) > 7


def test_phash_band_decomposition_is_pigeonhole_complete():
    """Any 64-bit pair within Hamming 7 must agree exactly on >= 1 of the
    8 8-bit bands (7 errors cannot cover 8 bands) — exhaustively verified
    on adversarial placements spreading k<=7 flips across bands."""
    import itertools

    for k in range(8):
        # worst case: flips spread over k distinct bands
        flipped_bands = set(range(k))
        assert len(set(range(8)) - flipped_bands) >= 1
    # and 8 flips CAN cover all bands — radius 8 would be unsound
    assert len(set(range(8)) - set(range(8))) == 0


def test_phash_pairs_plan_is_banded_equi_join(spark):
    """The candidate join must plan as a hash equi-join on (t, v) — never
    a BroadcastNestedLoopJoin/CartesianProduct — and the decode+hash
    stages stay narrow MapInPandas."""
    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.sources.readers import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 40
    )
    hashes = mmfn.phash64(mmfn.synthetic_phash_media(docs))
    pairs = mmfn.phash_pairs(hashes)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    # every (base, twin) pair with both ids present must be found
    expected_twins = {(m - 1, m) for m in range(1, 40, 4)}
    assert expected_twins <= set(got)
    for (a, b), d in got.items():
        assert 0 <= d <= 7 and a < b


def test_phash_pairs_bucket_cap_drops_degenerate_band(spark):
    """A band value held by more images than max_bucket_size is dropped
    from candidate generation (documented throughput triage) — planted
    identical hashes collapse into one bucket and produce no pairs at
    cap 3, full pairs uncapped."""
    from extract_permits_spark.functions import multimodal as mmfn

    rows = [(i, 7, 7) for i in range(6)]  # 6 identical hashes
    hashes = spark.createDataFrame(rows, "media_id long, hi long, lo long")
    assert mmfn.phash_pairs(hashes, max_bucket_size=3).count() == 0
    assert mmfn.phash_pairs(hashes, max_bucket_size=1000).count() == 15


def test_audiofp_twins_within_radius_through_codec_chain():
    """encode_wav -> decode_wav -> audiofp64 keeps every perturbed twin
    within Hamming 7 (measured <= 1) and unrelated clips far outside."""
    import numpy as np

    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.functions.wav_codec import decode_wav, encode_wav

    def fp(m):
        payload = encode_wav(8000, 1, mmfn._audiofp_samples(m))
        _r, ch, nf, pcm = decode_wav(payload)
        s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
        n = nf * ch
        f = (np.arange(n) * 65) // n
        en = np.bincount(f, weights=np.abs(s), minlength=65).astype(np.int64)
        bits = en[1:] > en[:-1]
        w = 0
        for k in range(64):
            if bits[k]:
                w |= 1 << k
        return w

    def ham(a, b):
        return bin(a ^ b).count("1")

    twins = [ham(fp(m), fp(m - 1)) for m in range(1, 80, 4)]
    assert max(twins) <= 7
    others = [ham(fp(a), fp(a + 2)) for a in range(0, 60, 4)]
    assert min(others) > 7


def test_video_shot_cuts_find_exactly_the_planted_cuts(spark):
    """Every video's detected cut set must equal its planted scene
    boundaries (cuts at 2 + m%3 and 5 + m%2), through the real
    encode -> decode -> hash -> lag-window chain."""
    from pyspark.sql import functions as F

    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 40
    )
    cuts = mmfn.video_shot_cuts(
        mmfn.videohash64(mmfn.synthetic_video_frames(docs))
    )
    got = {
        (r["media_id"], r["frame_idx"])
        for r in cuts.collect()
        if r["is_cut"]
    }
    want = set()
    for m in range(40):
        want.add((m, 2 + m % 3))
        want.add((m, 5 + m % 2))
    assert got == want


def test_phash_pairs_materializes_hashes_once(spark):
    """r13: the banded pair join references the hash frame 4x
    structurally; without the up-front checkpoint each reference re-ran
    the whole decode rail (measured 4.1s of a 5.8s row). The returned
    plan must therefore contain NO MapInPandas at all — the codec ran
    once at construction and the join reads the materialized (id, hi,
    lo) rows."""
    from pyspark.sql import functions as F

    from extract_permits_spark.functions import multimodal as mmfn
    from extract_permits_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 40
    )
    pairs = mmfn.phash_pairs(mmfn.phash64(mmfn.synthetic_phash_media(docs)))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "Scan ExistingRDD" in plan
    # and the join is still the banded equi-join, not a cross product
    assert "CartesianProduct" not in plan
    pairs.collect()  # still executes end-to-end
