"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md §2 S2-S4, S12-S13, E1/E7).

The reference decodes real media (whisper audio →
``rust/src/file_processor/audio/audio_processor.rs``, frame sampling →
``processors/src/video_processor.rs:1-145``, CLIP/ColPali image embeds
→ ``rust/src/lib.rs:546-550``). The media libraries are not in this
container, so the DECODE kernels are deterministic fakes behind a
clearly-marked seam (``_decode_image_stub``) — the Spark-side plumbing
(binaryFile-shaped schema, Arrow batch shape, partitioning, UDF
signatures) is real and tested.

Swap the stub for PIL/ffmpeg/soundfile calls on a cluster with the
libs installed; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# binaryFile source schema: path, modificationTime, length, content
ASSET_SCHEMA = ("path string, modality string, length long, "
                "content binary")
FEATURE_SCHEMA = ("path string, modality string, width int, height int, "
                  "n_frames int, embedding array<float>")
EMBED_DIM = 64


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media assets (binary payload = seeded bytes),
    shaped exactly like spark.read.format('binaryFile') output."""
    mods = ["image", "audio", "video"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                rng = np.random.default_rng((seed, int(i)))
                mod = mods[int(i) % 3]
                size = int(rng.integers(256, 4096))
                rows.append((f"/assets/{mod}/{int(i):06d}.bin", mod,
                             size, rng.bytes(size)))
            yield pd.DataFrame(rows, columns=["path", "modality",
                                              "length", "content"])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


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


def extract_features(assets: DataFrame,
                     batch_partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow binary batches).
    Frame-sampling semantics for video: n_frames = every-Nth cap 10
    (config.rs:189-191)."""
    df = assets
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches):
        for pdf in batches:
            out = []
            for path, mod, content in zip(pdf["path"], pdf["modality"],
                                          pdf["content"]):
                w, h, vec = _decode_image_stub(bytes(content))
                n_frames = min(10, max(1, len(content) // 512)) \
                    if mod == "video" else 1
                out.append((path, mod, w, h, n_frames, vec.tolist()))
            yield pd.DataFrame(out, columns=["path", "modality", "width",
                                             "height", "n_frames",
                                             "embedding"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


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
    selectivity scales as 2^bits per band."""
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
    b = (features.select("path", "embedding",
                         F.explode(bands).alias("bs"))
         .select("path", "embedding",
                 F.col("bs.band").alias("band"),
                 F.col("bs.sig").alias("sig")))
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, (F.col("l.band") == F.col("r.band")) &
                       (F.col("l.sig") == F.col("r.sig")) &
                       (F.col("l.path") < F.col("r.path")))
             .select(F.col("l.path").alias("p1"),
                     F.col("r.path").alias("p2"),
                     F.aggregate(
                         F.zip_with(F.col("l.embedding"),
                                    F.col("r.embedding"),
                                    lambda a, b_: a.cast("double") *
                                    b_.cast("double")),
                         F.lit(0.0), lambda acc, x: acc + x)
                     .alias("cos"))
             .distinct())  # a pair may match in several bands
    return pairs.filter(F.col("cos") >= threshold)
