"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md §2 S2-S4, S12-S13, E1/E7).

The reference decodes real media (whisper audio →
``rust/src/file_processor/audio/audio_processor.rs``, frame sampling →
``processors/src/video_processor.rs:1-145``, CLIP/ColPali image embeds
→ ``rust/src/lib.rs:546-550``). Container ships no media libraries,
but PNG / WAV / Y4M are decodable with stdlib zlib/wave + numpy
(``mediacodecs``), so those kernels are REAL: actual pixel/sample/
frame data drives the features. Formats needing native codecs (JPEG,
MP3, MP4…) fall back to the deterministic hash-derived stub behind the
same seam (``_decode_image_stub``); swap in PIL/ffmpeg there and
nothing else changes. Dispatch is by magic bytes per item inside the
Arrow batch.

Neural embeddings (CLIP et al.) stay out of scope: the "embedding" is
a classical content feature — 8×8 block-mean luminance for images /
pooled frames, pooled FFT magnitude spectrum for audio — L2-normalized
so downstream cosine/LSH operators behave like they would on model
embeddings.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import wave as _wave
import zlib as _zlib

import numpy as np
import pandas as pd
from pyspark import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession, functions as F

from embedanything_spark import mediacodecs as mc

# binaryFile source schema: path, modificationTime, length, content
ASSET_SCHEMA = ("path string, modality string, length long, "
                "content binary")
FEATURE_SCHEMA = ("path string, modality string, width int, height int, "
                  "n_frames int, embedding array<float>")
EMBED_DIM = 64


def synth_assets(spark: SparkSession, n: int, seed: int = 42,
                 real: bool = False) -> DataFrame:
    """Deterministic media assets shaped exactly like
    spark.read.format('binaryFile') output. ``real=False``: opaque
    seeded bytes (exercises the stub fallback). ``real=True``: actual
    PNG / WAV / Y4M payloads with closed-form content — image i is a
    horizontal gradient (pixel[y,x] = v + x with v = i % 200), audio a
    sine at a deterministic frequency, video k gradient frames — so
    decode results are independently recomputable (the image oracle in
    ``__spark_entry__`` derives width/height/luminance from the path
    alone)."""
    mods = ["image", "audio", "video"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                rng = np.random.default_rng((seed, i))
                mod = mods[i % 3]
                if not real:
                    size = int(rng.integers(256, 4096))
                    rows.append((f"/assets/{mod}/{i:06d}.bin", mod,
                                 size, rng.bytes(size)))
                    continue
                if mod == "image":
                    w, h, v = real_image_dims(i)
                    img = (np.full((h, w), v, np.uint16) +
                           np.arange(w, dtype=np.uint16)).astype(np.uint8)
                    payload = mc.encode_png(img, filter_type=i % 5)
                    ext = "png"
                elif mod == "audio":
                    tt = np.arange(1600, dtype=np.float64)
                    freq = 100.0 + (i % 40) * 50.0
                    payload = mc.encode_wav(
                        (np.sin(2 * np.pi * freq * tt / 16000)
                         * 18000).astype(np.int16))
                    ext = "wav"
                else:
                    k = 4 + i % 5
                    frames = (np.full((k, 16, 24), i % 100, np.uint16) +
                              np.arange(24, dtype=np.uint16)
                              ).astype(np.uint8)
                    payload = mc.encode_y4m(frames)
                    ext = "y4m"
                rows.append((f"/assets/{mod}/{i:06d}.{ext}", mod,
                             len(payload), payload))
            yield pd.DataFrame(rows, columns=["path", "modality",
                                              "length", "content"])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def real_image_dims(i: int) -> tuple[int, int, int]:
    """(width, height, base value) of synth real image i — closed form
    shared with the SQL oracle (multiples of 8 so the 8×8 block grid
    divides exactly; v + x ≤ 199 + 55 < 256, no wraparound)."""
    return 32 + 8 * (i % 4), 24 + 8 * (i % 3), i % 200


def _decode_image_stub(content: bytes) -> tuple[int, int, np.ndarray]:
    """STUB — deterministic fake decode. Real impl: PIL.Image.open +
    resize + CLIP-style encode. Raises nothing here so the pipeline is
    testable; a real deployment replaces this function only. EVERY
    output is hash-derived (no RNG) so the DuckDB oracle recomputes it
    independently: with hx = sha256 hex of the lowercase-hex payload,
    width/height = 64 + first two hex bytes, and embedding component
    d = (first 8 hex chars of sha256(hx || '-' || d) as int) % 1e6
    / 1e6 - 0.5, L2-normalized (mod.rs:80-82; normalization is a
    positive scale, so LSH sign bits and cosine match the oracle's
    unnormalized doubles exactly)."""
    hx = hashlib.sha256(content.hex().encode()).hexdigest()
    width = 64 + int(hx[0:2], 16)
    height = 64 + int(hx[2:4], 16)
    comps = np.array(
        [(int(hashlib.sha256(f"{hx}-{d}".encode()).hexdigest()[:8], 16)
          % 1000000) / 1e6 - 0.5 for d in range(EMBED_DIM)],
        dtype=np.float64)
    vec = (comps / np.linalg.norm(comps)).astype(np.float32)
    return width, height, vec


def _image_block_embedding(img: np.ndarray) -> np.ndarray:
    """8×8 grid of block-mean luminance → EMBED_DIM(=64) vector in
    [0,1], L2-normalized. Channels are averaged first (luminance)."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    rows = np.array_split(img.astype(np.float64), 8, axis=0)
    comps = np.array([blk.mean() for r in rows
                      for blk in np.array_split(r, 8, axis=1)]) / 255.0
    n = np.linalg.norm(comps)
    return (comps / n if n else comps).astype(np.float32)


def _audio_embedding(samples: np.ndarray) -> np.ndarray:
    """|rFFT| magnitude spectrum pooled into EMBED_DIM equal bands,
    L2-normalized — a classical spectral signature (the whisper slot's
    deterministic stand-in, but computed from the REAL samples)."""
    if samples.ndim == 2:
        samples = samples.mean(axis=1)
    mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
    bands = np.array([b.mean() if len(b) else 0.0
                      for b in np.array_split(mag, EMBED_DIM)])
    n = np.linalg.norm(bands)
    return (bands / n if n else bands).astype(np.float32)


# The ONLY exception classes the stdlib codecs are expected to raise
# on malformed/unsupported payloads: wave.Error is a direct Exception
# subclass (non-PCM WAV, e.g. IEEE-float format 3, and malformed chunk
# structure), IndexError covers truncated container payloads. Anything
# outside this tuple (MemoryError on an absurd frame buffer,
# TypeError/AttributeError from a genuine codec bug) PROPAGATES and
# fails the task — a systemic failure must never masquerade as a
# routine per-item stub fallback.
_CODEC_ERRORS = (ValueError, _zlib.error, _struct.error, EOFError,
                 NotImplementedError, _wave.Error, IndexError)


def _decode_asset(
        content: bytes) -> tuple[int, int, int, np.ndarray, bool, str]:
    """Magic-byte dispatch → (width, height, n_frames, embedding,
    decoded_for_real, reason). PNG/WAV/Y4M decode for real
    (``mediacodecs``); anything else — including a variant the narrow
    real kernels can't handle (palette/16-bit/interlaced PNG, non-PCM
    WAV, C420 Y4M) — degrades PER-ITEM to the deterministic stub
    instead of killing the whole Spark stage, matching the reference
    processors' per-item error contract. Only ``_CODEC_ERRORS`` take
    the stub path; systemic failures propagate. ``reason`` is ""
    for a real decode, else the rejecting exception's class name or
    "unrecognized_format". Video frame sampling: every Nth frame,
    cap 10 (config.rs:189-191) — skipped frames are never
    materialized, only byte offsets advance."""
    reason = "unrecognized_format"
    try:
        if content.startswith(mc.PNG_SIG):
            img = mc.decode_png(content)
            h, w = img.shape[:2]
            return w, h, 1, _image_block_embedding(img), True, ""
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            rate, samples = mc.decode_wav(content)
            n = len(samples)
            return n, (1 if samples.ndim == 1 else samples.shape[1]), \
                1, _audio_embedding(samples), True, ""
        if content.startswith(mc.Y4M_SIG):
            probe_w, probe_h, total, _ = mc.decode_y4m(
                content, sample_every=10**9)   # header-only pass
            step = max(1, -(-total // 10))     # every Nth, cap 10
            w, h, total, frames = mc.decode_y4m(
                content, sample_every=step, max_frames=10)
            emb = _image_block_embedding(
                frames.astype(np.float64).mean(axis=0))
            return w, h, len(frames), emb, True, ""
    except _CODEC_ERRORS as e:
        reason = type(e).__name__  # unsupported variant → stub below
    w, h, vec = _decode_image_stub(content)
    return w, h, min(10, max(1, len(content) // 512)), vec, False, reason


class _ClassCountParam(AccumulatorParam):
    """Accumulator param summing per-exception-class fallback counts
    (dict[str, int]) so operators can report WHICH failure classes
    degraded items, not just how many."""

    def zero(self, value):
        return dict(value) if value else {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = a.get(k, 0) + v
        return a


def extract_features(assets: DataFrame,
                     batch_partitions: int | None = None,
                     fallback_acc=None,
                     fallback_class_acc=None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow binary batches).
    Real decode for PNG/WAV/Y4M payloads, stub for opaque formats AND
    for items the real kernels reject — per-item degradation, see
    ``_decode_asset``. Stub fallbacks are counted in ``fallback_acc``
    (a Spark accumulator; one is created internally when not given)
    and per rejection class in ``fallback_class_acc`` (a dict
    accumulator keyed by exception class name / "unrecognized_format")
    so a burst of, say, ``zlib.error`` reads as a codec problem rather
    than an opaque-format mix. Accumulator semantics: updates from
    transformations are AT-LEAST-ONCE (task retries / plan
    re-execution re-add), so treat the counts as upper bounds on
    degraded items — persist the frame before multi-action plans if
    the exact counts matter."""
    df = assets
    if batch_partitions:
        df = df.repartition(batch_partitions)
    sc = df.sparkSession.sparkContext
    fallbacks = fallback_acc if fallback_acc is not None else \
        sc.accumulator(0)
    by_class = fallback_class_acc if fallback_class_acc is not None \
        else sc.accumulator({}, _ClassCountParam())

    def run(batches):
        for pdf in batches:
            out = []
            for path, mod, content in zip(pdf["path"], pdf["modality"],
                                          pdf["content"]):
                content = bytes(content)
                w, h, n_frames, vec, real, reason = \
                    _decode_asset(content)
                if not real:
                    fallbacks.add(1)
                    by_class.add({reason: 1})
                if mod != "video" and not real:
                    n_frames = 1
                out.append((path, mod, w, h, n_frames, vec.tolist()))
            yield pd.DataFrame(out, columns=["path", "modality", "width",
                                             "height", "n_frames",
                                             "embedding"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


IMAGE_STATS_SCHEMA = "path string, width int, height int, lum2 long"


def image_stats(assets: DataFrame) -> DataFrame:
    """REAL-decode oracle surface: PNG → (path, width, height,
    lum2 = round(2 × mean luminance)). Integer-exact (the synth
    gradient's mean is v + (w-1)/2, a multiple of 0.5), so the DuckDB
    oracle recomputes it from the path id with zero float risk while
    the value still requires an actual zlib inflate + unfilter of the
    actual pixels."""
    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img = mc.decode_png(bytes(content))
                h, w = img.shape[:2]
                lum = img.astype(np.float64).mean()
                out.append((path, w, h, int(round(2 * lum))))
            yield pd.DataFrame(out, columns=["path", "width", "height",
                                             "lum2"])

    return (assets.filter(F.col("modality") == "image")
            .mapInPandas(run, schema=IMAGE_STATS_SCHEMA))


N_PLANES = 32  # total hyperplanes
N_BANDS = 4    # bands of 8 bits; candidates match on ANY full band
MM_PLANES_SEED = 1234


def mm_planes() -> np.ndarray:
    """Deterministic hyperplanes shared by the Spark plan and the
    code-generated DuckDB oracle (literals on both sides)."""
    rng = np.random.default_rng(MM_PLANES_SEED)
    return rng.standard_normal((N_PLANES, EMBED_DIM)).astype(float)


def near_dup_by_embedding(features: DataFrame,
                          threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup candidates via BANDED sign-LSH:
    32 fixed pseudo-random hyperplanes (seeded — no Date/random at
    plan time) → 4 bands of 8 sign bits; a pair is a candidate when
    ANY band's full pattern matches (standard OR-of-ANDs banding:
    8-bit bands keep buckets selective while the 4-way OR keeps
    recall); pairwise cosine only WITHIN band buckets (no O(n²) cross
    join). At 10^12 rows raise the bits per band (e.g. 4×16) —
    selectivity scales as 2^bits per band.

    ``features`` is referenced three times in the plan (signature
    branch + two candidate fetch joins): pass a MATERIALIZED table
    (parquet/Iceberg), not an unpersisted decode stage, or the decode
    runs three times."""
    planes = mm_planes()
    bits = [
        F.when(
            F.aggregate(
                F.zip_with("embedding",
                           F.array(*[F.lit(float(v)) for v in p]),
                           lambda a, b: a.cast("double") * b),
                F.lit(0.0), lambda acc, x: acc + x) >= 0, "1")
        .otherwise("0")
        for p in planes]
    per_band = N_PLANES // N_BANDS
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.concat(*bits[i * per_band:(i + 1) * per_band])
                 .alias("sig"))
        for i in range(N_BANDS)])
    # Band self-join exchanges (path, band, sig) ONLY: embeddings are
    # dropped before the shuffle and re-fetched for the surviving
    # candidate pairs — O(pairs) vector payload, not O(rows × bands).
    b = (features.select("path", F.explode(bands).alias("bs"))
         .select("path",
                 F.col("bs.band").alias("band"),
                 F.col("bs.sig").alias("sig")))
    l, r = b.alias("l"), b.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band")) &
                      (F.col("l.sig") == F.col("r.sig")) &
                      (F.col("l.path") < F.col("r.path")))
            .select(F.col("l.path").alias("p1"),
                    F.col("r.path").alias("p2"))
            .distinct())  # a pair may match in several bands
    pairs = (cand
             .join(features.select(F.col("path").alias("p1"),
                                   F.col("embedding").alias("e1")), "p1")
             .join(features.select(F.col("path").alias("p2"),
                                   F.col("embedding").alias("e2")), "p2")
             .select("p1", "p2",
                     F.aggregate(
                         F.zip_with(F.col("e1"), F.col("e2"),
                                    lambda a, b_: a.cast("double") *
                                    b_.cast("double")),
                         F.lit(0.0), lambda acc, x: acc + x)
                     .alias("cos")))
    return pairs.filter(F.col("cos") >= threshold)
