"""Perceptual image hashing (dHash) + banded near-duplicate pairing.

The training-data move this implements: a 100 TB multimodal corpus carries
billions of images; exact byte-dedup misses re-encodes, brightness tweaks,
and rescales. The standard cheap answer is a *difference hash* (dHash):
decode → grayscale → area-average down to a 9×8 grid → 64 bits, one per
adjacent-pixel comparison. Near-duplicates are then found WITHOUT an n²
scan by splitting the 64 bits into 4 bands of 16 and bucket-joining on
band equality (the Hamming-space analogue of MinHash-LSH banding): any
pair within Hamming distance 6 agrees exactly on ≥1 band whenever the
differing bits land in ≤3 bands, and the final Hamming filter makes the
report exact for every surfaced pair.

Everything pixel-side runs through the REAL stdlib codecs in
``operators/imaging.py`` (PNG/BMP/GIF/TIFF decode), Arrow-batched via
``mapInPandas``; the pair join is pure DataFrame ops (explode → shuffle on
16-bit band keys → bit_count on JVM longs), so the scale path is one
bounded shuffle, no cartesian anywhere.

Reference parity: the reference's media surface stops at decode+describe
(fdp/services/vision_service.py); image-level near-dup is part of this
engine's beyond-reference training-pipeline surface, same family as
operators/dedup.py's MinHash-LSH (text) — this is the pixel twin.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# dHash grid: 9 columns × 8 rows of grayscale means → 8×8 comparison bits.
_GRID_W, _GRID_H = 9, 8


def dhash_gray(width: int, height: int, channels: int, rows: list[bytes]) -> tuple[int, int]:
    """64-bit dHash of decoded scanlines → two unsigned 32-bit halves.

    Area-average downsample to the 9×8 grid (exact for images whose
    dimensions are integer multiples of the grid — constant source blocks
    average back to themselves), integer-luminance for multi-channel rows
    (ITU-R 601 weights on a /1000 integer scale, so the kernel is
    float-free and bit-reproducible everywhere). Bit (r, c) of the hash is
    1 iff grid[r][c+1] > grid[r][c]; rows 0-3 fill ``hi``, rows 4-7 ``lo``,
    bit index ``(r % 4) * 8 + c`` — both halves fit a BIGINT unsigned.
    """
    if width < _GRID_W or height < _GRID_H:
        raise ValueError(f"image {width}x{height} smaller than dhash grid")
    # integer luminance per pixel (value * 1000 scale keeps it exact)
    lum: list[list[int]] = []
    for row in rows:
        vals = []
        for x in range(width):
            if channels == 1:
                vals.append(row[x] * 1000)
            else:
                base = x * channels
                r8, g8, b8 = row[base], row[base + 1], row[base + 2]
                vals.append(299 * r8 + 587 * g8 + 114 * b8)
        lum.append(vals)
    # area-average: cell (gr, gc) covers source rows [gr*h//8, (gr+1)*h//8)
    # and cols [gc*w//9, (gc+1)*w//9) — exact integer box sums, compared
    # as cross-multiplied fractions so no float division enters the hash.
    row_edges = [gr * height // _GRID_H for gr in range(_GRID_H + 1)]
    col_edges = [gc * width // _GRID_W for gc in range(_GRID_W + 1)]
    sums = [[0] * _GRID_W for _ in range(_GRID_H)]
    areas = [[0] * _GRID_W for _ in range(_GRID_H)]
    for gr in range(_GRID_H):
        for gc in range(_GRID_W):
            s = 0
            for y in range(row_edges[gr], row_edges[gr + 1]):
                lrow = lum[y]
                for x in range(col_edges[gc], col_edges[gc + 1]):
                    s += lrow[x]
            sums[gr][gc] = s
            areas[gr][gc] = (row_edges[gr + 1] - row_edges[gr]) * (
                col_edges[gc + 1] - col_edges[gc]
            )
    hi = lo = 0
    for gr in range(_GRID_H):
        for gc in range(_GRID_W - 1):
            # mean(right) > mean(left)  ⇔  sum_r * area_l > sum_l * area_r
            if sums[gr][gc + 1] * areas[gr][gc] > sums[gr][gc] * areas[gr][gc + 1]:
                bit = 1 << ((gr % 4) * 8 + gc)
                if gr < 4:
                    hi |= bit
                else:
                    lo |= bit
    return hi, lo


def dhash_payload(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, hi, lo) for any image the real codecs can read:
    magic-sniffed PNG / BMP / GIF (first frame) / grayscale TIFF / JPEG
    (baseline + progressive, via the jpegmini decoder — the format most
    of a web crawl's images arrive in, and the one where perceptual
    hashing earns its keep: a JPEG re-encode changes every byte but only
    a few dHash bits)."""
    from frappe_data_pipelines_spark.operators.imaging import (
        bmp_decode,
        gif_decode_first_frame,
        png_decode,
        tiff_decode_gray,
    )

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, ch, rows = png_decode(payload)
    elif payload[:2] == b"BM":
        w, h, rows = bmp_decode(payload)
        ch = 1
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, rows = gif_decode_first_frame(payload)
        ch = 1
    elif payload[:4] in (b"II*\x00", b"MM\x00*"):
        w, h, rows = tiff_decode_gray(payload)
        ch = 1
    elif payload[:2] == b"\xff\xd8":
        from frappe_data_pipelines_spark.operators.jpegmini import (
            JpegError,
            jpeg_decode_gray,
        )

        try:
            w, h, rows = jpeg_decode_gray(payload)
        except JpegError as e:
            raise ValueError(str(e)) from e
        ch = 1
    else:
        raise ValueError("unsupported image format for dhash")
    hi, lo = dhash_gray(w, h, ch, rows)
    return w, h, hi, lo


# ---------------------------------------------------------------------------
# deterministic pattern corpus (the oracle-closed-form image generator)
# ---------------------------------------------------------------------------
#
# pix(r, c) = (seed + (r·16 + c)·m + off) mod 256 over a 9×8 grid,
# optionally magnified by an integer scale with constant scale×scale
# blocks (so the area-average downsample reconstructs the grid EXACTLY).
# The parameters are pure integer functions of doc_id:
#
#   g    = doc_id // 4                   (4 consecutive docs form a group)
#   m    = 97 + 2·((g·7) mod 64)         (odd multiplicative stride)
#   seed = (g·137) mod 251               (group base level)
#   off  = (doc_id mod 4) · 4            (within-group brightness shift)
#   scale= 1 + (doc_id mod 2) · 3        (1× or 4× magnification)
#
# The odd stride m ≥ 97 makes adjacent-pixel differences wrap mod 256
# pseudo-uniformly, so the comparison bits are BALANCED (measured ≈36/64
# ones, hottest 16-bit band bucket 35 docs at N=500) instead of the
# all-ones hash a small additive step produces — the band join stays a
# real LSH workload rather than one giant cluster. Within a group the
# four docs share (seed, m) and differ only by a uniform +off brightness
# shift — dHash compares ADJACENT pixels, so bits flip only where the
# shift moves a comparison across the mod-256 wrap: genuine
# near-duplicates with small Hamming distance. Because every pixel is
# closed-form integer arithmetic, a SQL oracle reproduces the hashes
# bit-for-bit — which pins the whole Spark path (real PNG encode → real
# PNG decode → downsample → hash → band join) end to end.


def _pattern_params(doc_id: int) -> tuple[int, int, int, int]:
    g = doc_id // 4
    m = 97 + 2 * ((g * 7) % 64)
    seed = (g * 137) % 251
    off = (doc_id % 4) * 4
    scale = 1 + (doc_id % 2) * 3
    return seed, m, off, scale


def synth_pattern_png(doc_id: int, extra_off: int = 0) -> bytes:
    """Real PNG bytes (grayscale, filter 0, zlib) of the pattern image.
    ``extra_off`` adds a further uniform brightness shift — a deterministic
    stand-in for a re-crawl/re-encode of the same image (flips only
    wrap-crossing comparisons, keeping the re-render a near-duplicate of
    the original)."""
    from frappe_data_pipelines_spark.operators.imaging import png_encode

    seed, m, off, scale = _pattern_params(doc_id)
    off += extra_off
    rows = []
    for r in range(_GRID_H):
        line = bytes(
            (seed + (r * 16 + c) * m + off) % 256 for c in range(_GRID_W)
        )
        expanded = b"".join(bytes([v]) * scale for v in line)
        rows.extend([expanded] * scale)
    return png_encode(rows, color_type=0)


def documents_as_pattern_images(
    docs: DataFrame, id_col: str = "doc_id", extra_off: int = 0
) -> DataFrame:
    """(doc_id, content BINARY) of real pattern PNGs — the image twin of
    ``documents_as_wav``: real containers the codec must actually parse.
    ``extra_off`` renders every image as its re-crawl variant (see
    ``synth_pattern_png``)."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        synth_pattern_png(int(d), extra_off) for d in pdf["doc_id"]
                    ],
                }
            )

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .repartition(par)
        .mapInPandas(run, schema=schema)
    )


IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dhash_hi", T.LongType()),
        T.StructField("dhash_lo", T.LongType()),
        T.StructField("hash_error", T.StringType()),
    ]
)


def image_dhash(df: DataFrame, id_col: str = "doc_id", bin_col: str = "content") -> DataFrame:
    """binary image column → (width, height, dhash_hi, dhash_lo) via the
    real decoders; decode failures land in ``hash_error`` (totality — a
    corrupt image must not kill a 100 TB scan)."""
    import pandas as pd

    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(bin_col).alias("content")
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_DHASH_SCHEMA.fields}
            for did, payload in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, hi, lo = dhash_payload(bytes(payload))
                    out["doc_id"].append(did)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["dhash_hi"].append(hi)
                    out["dhash_lo"].append(lo)
                    out["hash_error"].append(None)
                except (ValueError, IndexError, EOFError) as exc:
                    out["doc_id"].append(did)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["dhash_hi"].append(None)
                    out["dhash_lo"].append(None)
                    out["hash_error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=IMAGE_DHASH_SCHEMA)


def pattern_image_dhash(
    docs: DataFrame, id_col: str = "doc_id", extra_off: int = 0
) -> DataFrame:
    """Fused ``image_dhash(documents_as_pattern_images(docs, extra_off))``:
    the same ``synth_pattern_png`` → ``dhash_payload`` kernel sequence in
    ONE mapInPandas stage, so the PNG bytes never cross the JVM↔Python
    Arrow boundary — only doc_id goes in, only the hash row comes out
    (r12 probe: two-stage 1.30/2.16 s best/median vs fused 0.75/1.24 at
    sf0.1). Output is bit-identical to the composition by construction."""
    import pandas as pd

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_DHASH_SCHEMA.fields}
            for did in pdf["doc_id"]:
                did = int(did)
                try:
                    w, h, hi, lo = dhash_payload(synth_pattern_png(did, extra_off))
                    vals = (did, w, h, hi, lo, None)
                except (ValueError, IndexError, EOFError) as exc:
                    vals = (did, None, None, None, None, f"{type(exc).__name__}: {exc}")
                for k, v in zip(out, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .repartition(par)
        .mapInPandas(run, schema=IMAGE_DHASH_SCHEMA)
    )


def dhash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded near-dup pairs over dHash columns — see
    ``banded_hamming_pairs`` (the modality-agnostic join this wraps)."""
    return banded_hamming_pairs(
        hashes, max_hamming=max_hamming, id_col=id_col,
        hi_col="dhash_hi", lo_col="dhash_lo",
    )


def banded_hamming_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    hi_col: str = "dhash_hi",
    lo_col: str = "dhash_lo",
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Banded near-dup pairs over ANY 64-bit Hamming-space signature
    (two unsigned 32-bit halves): explode 4×16-bit bands → shuffle on
    (band_index, band_value) → distinct candidate pairs → exact Hamming
    filter on the JVM (``bit_count(hi⊕hi) + bit_count(lo⊕lo)``). The
    image dHash and the audio energy fingerprint both ride this join —
    Hamming-space banding is modality-agnostic.

    Scale shape: one shuffle keyed on 16-bit band values (bounded key
    cardinality 4·65536 with corpus-proportional bucket sizes); no n² term.
    Recall contract: a pair at Hamming ≤ max_hamming is surfaced whenever
    its differing bits touch ≤ 3 of the 4 bands (guaranteed complete for
    Hamming ≤ 3; the standard LSH-banding trade above that). Every
    surfaced pair is EXACT — the final filter recomputes true distance.

    **Hot-bucket bound** (the same degrade ``minhash_lsh_pairs`` carries):
    a (band, value) bucket holding B signatures yields B² self-join rows
    in ONE task — a 100 TB image corpus has million-strong families of
    the same logo/tracking pixel. Buckets larger than ``max_bucket_size``
    degrade to STAR linking against the bucket's minimum doc_id (B−1
    rows). Inside a hot bucket, recall degrades from pairwise to
    hub-distance (a member within ``max_hamming`` of another member but
    not of the hub is missed) — deterministic, and acceptable precisely
    because hot Hamming buckets are near-identical families; exactness of
    every SURFACED pair is unaffected. Catalog oracles run with corpora
    whose buckets sit far below the default cap, so the SQL mirror needs
    no hot branch.
    """
    # cache the narrow post-kernel hash table (3 longs/row): the hot
    # groupBy, the cool anti-join, and the hub join all re-reference this
    # subtree, and without the cache Spark re-runs the upstream Python
    # signature stage (decode + hash) three times — the dominant cost when
    # hashes come off a mapInPandas kernel. An r13 A/B re-tested the
    # alternative (drop the cache, share one keyed repartition exchange
    # across all four consumers — the shape that wins for the JVM-upstream
    # LSH): it lost here twice running (image median 2.46 vs 2.22 s, video
    # 3.80 vs 3.00 — BENCH_RUNS_r13.json.banded_cache_ab); the in-memory
    # columnar cache beats four shuffle-file reads when the upstream rows
    # are this narrow. Lifetime: the CacheManager dedupes by analyzed
    # plan, so repeated calls over the same source reuse one entry rather
    # than piling up; distinct sources accumulate until
    # spark.catalog.clearCache() (which the bench harness issues per
    # pass) or session end — the repo-wide .cache() convention
    # (tpch_extra, textqueries fps).
    h = (
        hashes.where(F.col(hi_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(hi_col).alias("dhash_hi"),
            F.col(lo_col).alias("dhash_lo"),
        )
        .cache()
    )
    bands = h.select(
        "doc_id",
        "dhash_hi",
        "dhash_lo",
        F.posexplode(
            F.array(
                F.col("dhash_lo") % 65536,
                (F.col("dhash_lo") / 65536).cast("long"),
                F.col("dhash_hi") % 65536,
                (F.col("dhash_hi") / 65536).cast("long"),
            )
        ).alias("band_idx", "band_val"),
    )
    # hot list is tiny by construction (≤ corpus/max_bucket_size rows) →
    # broadcast both the anti-join (cool path) and the hub join (hot path)
    hot = (
        bands.groupBy("band_idx", "band_val")
        .agg(
            F.count(F.lit(1)).alias("__bsz"),
            F.min("doc_id").alias("__hub"),
            F.min_by("dhash_hi", "doc_id").alias("__hub_hi"),
            F.min_by("dhash_lo", "doc_id").alias("__hub_lo"),
        )
        .filter(F.col("__bsz") > F.lit(max_bucket_size))
    )
    # hot list is tiny by construction (≤ corpus/max_bucket_size rows) →
    # broadcast both the anti-join (cool path) and the hub join (hot path).
    # (r13: sharing ONE full-hot broadcast between the two joins was tried
    # and is a plan NO-OP — Catalyst prunes the anti-join's build side
    # back to the key columns through the broadcast hint, so the two
    # BroadcastExchanges differ and never reuse; before/after plans
    # byte-identical mod expr ids. Kept in the r12 form.)
    cool = bands.join(
        F.broadcast(hot.select("band_idx", "band_val")),
        ["band_idx", "band_val"],
        "left_anti",
    )
    left = cool.alias("x")
    right = cool.alias("y")
    pairs_hot = (
        bands.join(F.broadcast(hot), ["band_idx", "band_val"])
        .filter(F.col("doc_id") != F.col("__hub"))
        .select(
            # hub = min(doc_id) < member, so (hub, member) is ordered
            F.col("__hub").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("__hub_hi").alias("hi_a"),
            F.col("__hub_lo").alias("lo_a"),
            F.col("dhash_hi").alias("hi_b"),
            F.col("dhash_lo").alias("lo_b"),
        )
    )
    cand = (
        left.join(
            right,
            on=[
                F.col("x.band_idx") == F.col("y.band_idx"),
                F.col("x.band_val") == F.col("y.band_val"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.dhash_hi").alias("hi_a"),
            F.col("x.dhash_lo").alias("lo_a"),
            F.col("y.dhash_hi").alias("hi_b"),
            F.col("y.dhash_lo").alias("lo_b"),
        )
        .unionByName(pairs_hot)
    )
    # exact Hamming BEFORE the pair dedup: the distance is functionally
    # determined by (doc_a, doc_b), so filtering first is equivalent — and
    # it prunes non-matching candidates before they pay the dedup shuffle
    hamming = F.bit_count(F.expr("hi_a ^ hi_b")) + F.bit_count(F.expr("lo_a ^ lo_b"))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# video near-dup: per-frame dHash over real AVI containers, frame-aligned
# banded join — the fourth modality (text MinHash / image dHash / audio
# energy fingerprint / this)
# ---------------------------------------------------------------------------

_VIDEO_FRAMES = 8  # frames per synthetic pattern video


def synth_pattern_avi(doc_id: int, extra_off: int = 0) -> bytes:
    """Real RIFF/AVI bytes (uncompressed DIB frames — the lossless profile
    ``avimini`` carries precisely so decoded pixels stay closed-form; MJPEG
    quantization cannot round-trip exactly): 8 frames of the scrambled
    9×8 pattern with a per-frame +53·t drift,

        pix(r, c, t) = (seed + (r·16 + c)·m + t·53 + off) mod 256,

    same (seed, m, off) family as ``synth_pattern_png`` — four consecutive
    docs form a near-duplicate group (measured: 814 video pairs at ≥6/8
    close frames over N=500, 632 within-group, hottest frame band
    bucket 40)."""
    from frappe_data_pipelines_spark.operators.avimini import (
        avi_write,
        dib_encode_gray,
    )

    seed, m, off, _scale = _pattern_params(doc_id)
    off += extra_off  # re-encode stand-in (uniform brightness shift)
    frames = []
    for t in range(_VIDEO_FRAMES):
        rows = [
            bytes((seed + (r * 16 + c) * m + t * 53 + off) % 256 for c in range(_GRID_W))
            for r in range(_GRID_H)
        ]
        frames.append(dib_encode_gray(rows))
    return avi_write(frames, _GRID_W, _GRID_H, fps=10, codec=b"DIB ")


def documents_as_pattern_videos(docs: DataFrame, id_col: str = "doc_id",
                                extra_off: int = 0) -> DataFrame:
    """(doc_id, content BINARY) of real pattern AVIs; ``extra_off``
    produces the re-encoded arrival batch for incremental dedup."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [synth_pattern_avi(int(d), extra_off) for d in pdf["doc_id"]],
                }
            )

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .repartition(par)
        .mapInPandas(run, schema=schema)
    )


VIDEO_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("dhash_hi", T.LongType()),
        T.StructField("dhash_lo", T.LongType()),
        T.StructField("video_error", T.StringType()),
    ]
)


def video_frame_dhash(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """AVI binary column → one dHash row PER FRAME via the real container
    walk (``avimini.avi_parse``) and DIB pixel decode; corrupt containers
    emit a single error row (totality). MJPEG-coded videos are decodable
    via jpegmini but not closed-form oracleable — callers wanting them go
    through ``multimodal.video_frames``."""
    import pandas as pd

    from frappe_data_pipelines_spark.operators.avimini import (
        AviError,
        avi_parse,
        dib_decode_gray,
    )

    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(bin_col).alias("content")
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = {k.name: [] for k in VIDEO_DHASH_SCHEMA.fields}

            def emit(did, idx, hi, lo, err):
                for k, v in zip(out, (did, idx, hi, lo, err)):
                    out[k].append(v)

            for did, payload in zip(pdf["doc_id"], pdf["content"]):
                try:
                    meta = avi_parse(bytes(payload))
                    if meta["codec"] != "DIB":
                        raise AviError(f"dhash path needs DIB frames, got {meta['codec']}")
                    w, h = meta["width"], meta["height"]
                    for idx, frame in enumerate(meta["frames"]):
                        rows = dib_decode_gray(frame, w, h)
                        hi, lo = dhash_gray(w, h, 1, rows)
                        emit(did, idx, hi, lo, None)
                except (AviError, ValueError, IndexError) as exc:
                    emit(did, None, None, None, f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=VIDEO_DHASH_SCHEMA)


def pattern_video_frame_dhash(
    docs: DataFrame, id_col: str = "doc_id", extra_off: int = 0
) -> DataFrame:
    """Fused ``video_frame_dhash(documents_as_pattern_videos(docs,
    extra_off))``: the same ``synth_pattern_avi`` → ``avi_parse`` →
    ``dib_decode_gray`` → ``dhash_gray`` kernel sequence in ONE
    mapInPandas stage — the AVI container bytes never cross the
    JVM↔Python Arrow boundary (see ``pattern_image_dhash``). Output is
    bit-identical to the composition by construction."""
    import pandas as pd

    from frappe_data_pipelines_spark.operators.avimini import (
        AviError,
        avi_parse,
        dib_decode_gray,
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = {k.name: [] for k in VIDEO_DHASH_SCHEMA.fields}

            def emit(did, idx, hi, lo, err):
                for k, v in zip(out, (did, idx, hi, lo, err)):
                    out[k].append(v)

            for did in pdf["doc_id"]:
                did = int(did)
                try:
                    meta = avi_parse(synth_pattern_avi(did, extra_off))
                    if meta["codec"] != "DIB":
                        raise AviError(f"dhash path needs DIB frames, got {meta['codec']}")
                    w, h = meta["width"], meta["height"]
                    for idx, frame in enumerate(meta["frames"]):
                        rows = dib_decode_gray(frame, w, h)
                        hi, lo = dhash_gray(w, h, 1, rows)
                        emit(did, idx, hi, lo, None)
                except (AviError, ValueError, IndexError) as exc:
                    emit(did, None, None, None, f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .repartition(par)
        .mapInPandas(run, schema=VIDEO_DHASH_SCHEMA)
    )


def video_neardup_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = 6,
    min_close_frames: int = 6,
    id_col: str = "doc_id",
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Video near-dup pairs from per-frame dHashes: the banded-Hamming
    join keyed by (frame_idx, band_idx, band_val) — FRAME-ALIGNED, so two
    videos only pair through the same temporal position — then one
    aggregation counts a pair's close frames and keeps pairs with
    ``min_close_frames`` or more. ``n_close_frames`` counts frames the
    banding SURFACED at Hamming ≤ max_hamming (complete for ≤3 per the
    banding contract; the standard LSH trade above that) — the oracle
    re-runs the identical contract, so the count is pinned, not fuzzy.

    Scale shape: one shuffle on (frame, band) keys + one groupBy on the
    pair — per-frame band buckets are strictly smaller than video-level
    ones, and no n² term exists anywhere. Hot (frame, band, value) buckets
    past ``max_bucket_size`` degrade to star linking against the bucket's
    minimum doc_id (same bound and same rationale as
    ``banded_hamming_pairs``: a million-strong family of one intro/outro
    frame must not emit B² rows in one task; hub-anchored counts are the
    deterministic, observable degrade)."""
    # cache: same rationale (and same r13 A/B verdict) as
    # banded_hamming_pairs — three downstream references must not re-run
    # the per-frame decode+hash Python stage; the shared-exchange
    # alternative measured slower twice running
    # (BENCH_RUNS_r13.json.banded_cache_ab)
    h = (
        frame_hashes.where(F.col("dhash_hi").isNotNull())
        .select(F.col(id_col).alias("doc_id"), "frame_idx", "dhash_hi", "dhash_lo")
        .cache()
    )
    bands = h.select(
        "doc_id",
        "frame_idx",
        "dhash_hi",
        "dhash_lo",
        F.posexplode(
            F.array(
                F.col("dhash_lo") % 65536,
                (F.col("dhash_lo") / 65536).cast("long"),
                F.col("dhash_hi") % 65536,
                (F.col("dhash_hi") / 65536).cast("long"),
            )
        ).alias("band_idx", "band_val"),
    )
    hot = (
        bands.groupBy("frame_idx", "band_idx", "band_val")
        .agg(
            F.count(F.lit(1)).alias("__bsz"),
            F.min("doc_id").alias("__hub"),
            F.min_by("dhash_hi", "doc_id").alias("__hub_hi"),
            F.min_by("dhash_lo", "doc_id").alias("__hub_lo"),
        )
        .filter(F.col("__bsz") > F.lit(max_bucket_size))
    )
    cool = bands.join(
        F.broadcast(hot.select("frame_idx", "band_idx", "band_val")),
        ["frame_idx", "band_idx", "band_val"],
        "left_anti",
    )
    pairs_hot = (
        bands.join(F.broadcast(hot), ["frame_idx", "band_idx", "band_val"])
        .filter(F.col("doc_id") != F.col("__hub"))
        .select(
            F.col("__hub").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("frame_idx").alias("frame_idx"),
            F.col("__hub_hi").alias("hi_a"),
            F.col("__hub_lo").alias("lo_a"),
            F.col("dhash_hi").alias("hi_b"),
            F.col("dhash_lo").alias("lo_b"),
        )
    )
    left = cool.alias("x")
    right = cool.alias("y")
    cand = (
        left.join(
            right,
            on=[
                F.col("x.frame_idx") == F.col("y.frame_idx"),
                F.col("x.band_idx") == F.col("y.band_idx"),
                F.col("x.band_val") == F.col("y.band_val"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.frame_idx").alias("frame_idx"),
            F.col("x.dhash_hi").alias("hi_a"),
            F.col("x.dhash_lo").alias("lo_a"),
            F.col("y.dhash_hi").alias("hi_b"),
            F.col("y.dhash_lo").alias("lo_b"),
        )
        .unionByName(pairs_hot)
    )
    # Hamming filter BEFORE the (pair, frame) dedup — the distance is
    # functionally determined by (doc_a, doc_b, frame_idx), so the reorder
    # is exact and prunes far candidates ahead of both shuffles
    hamming = F.bit_count(F.expr("hi_a ^ hi_b")) + F.bit_count(F.expr("lo_a ^ lo_b"))
    return (
        cand.where(hamming.cast("int") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b", "frame_idx"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_close_frames"))
        .where(F.col("n_close_frames") >= min_close_frames)
    )


def video_neardup_join(
    new_frame_hashes: DataFrame,
    corpus_frame_hashes: DataFrame,
    max_hamming: int = 6,
    min_close_frames: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """INCREMENTAL video dedup: match a NEW batch of per-frame dHashes
    against the EXISTING corpus — ``video_neardup_pairs``'s frame-aligned
    banding in the asymmetric ingest-door shape of
    ``banded_hamming_join``. Returns (new_id, corpus_id, n_close_frames)
    for pairs with >= ``min_close_frames`` frames within
    ``max_hamming``.

    Scale shape: the new batch's exploded (frame, band) rows BROADCAST;
    the corpus pays one scan with a map-side probe and no shuffle —
    runnable per micro-batch."""

    def explode(df: DataFrame, prefix: str) -> DataFrame:
        h = df.where(F.col("dhash_hi").isNotNull()).select(
            F.col(id_col).alias(f"{prefix}_id"),
            "frame_idx",
            F.col("dhash_hi").alias(f"{prefix}_hi"),
            F.col("dhash_lo").alias(f"{prefix}_lo"),
        )
        return h.select(
            f"{prefix}_id",
            "frame_idx",
            f"{prefix}_hi",
            f"{prefix}_lo",
            F.posexplode(
                F.array(
                    F.col(f"{prefix}_lo") % 65536,
                    (F.col(f"{prefix}_lo") / 65536).cast("long"),
                    F.col(f"{prefix}_hi") % 65536,
                    (F.col(f"{prefix}_hi") / 65536).cast("long"),
                )
            ).alias("band_idx", "band_val"),
        )

    cand = (
        explode(corpus_frame_hashes, "corpus")
        .join(
            F.broadcast(explode(new_frame_hashes, "new")),
            ["frame_idx", "band_idx", "band_val"],
        )
        .select("new_id", "corpus_id", "frame_idx", "new_hi", "new_lo",
                "corpus_hi", "corpus_lo")
    )
    hamming = F.bit_count(F.expr("new_hi ^ corpus_hi")) + F.bit_count(
        F.expr("new_lo ^ corpus_lo")
    )
    return (
        cand.where(hamming.cast("int") <= max_hamming)
        .dropDuplicates(["new_id", "corpus_id", "frame_idx"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").cast("bigint").alias("n_close_frames"))
        .where(F.col("n_close_frames") >= min_close_frames)
    )


def banded_hamming_join(
    new_hashes: DataFrame,
    corpus_hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    hi_col: str = "dhash_hi",
    lo_col: str = "dhash_lo",
) -> DataFrame:
    """INCREMENTAL perceptual dedup: match a NEW batch of signatures
    against an EXISTING corpus (the ingest-time shape — a re-crawl's
    images checked at the door, the image analogue of
    ``simhash_incremental_pairs``). Returns (new_id, corpus_id, hamming),
    every surfaced pair exact, recall per the usual 4×16-bit banding
    contract.

    Scale shape: the new batch is a micro-batch — orders of magnitude
    smaller than the corpus — so its exploded band rows BROADCAST and the
    corpus pays ONE scan with a map-side hash-join probe: no shuffle of
    the corpus at all, which is what makes this runnable per ingest batch
    rather than per dedup campaign. (For a big backfill where the 'new'
    side is itself corpus-sized, union both sides into
    ``banded_hamming_pairs`` instead.)"""

    def explode_bands(df: DataFrame, prefix: str) -> DataFrame:
        h = df.where(F.col(hi_col).isNotNull()).select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(hi_col).alias(f"{prefix}_hi"),
            F.col(lo_col).alias(f"{prefix}_lo"),
        )
        return h.select(
            f"{prefix}_id",
            f"{prefix}_hi",
            f"{prefix}_lo",
            F.posexplode(
                F.array(
                    F.col(f"{prefix}_lo") % 65536,
                    (F.col(f"{prefix}_lo") / 65536).cast("long"),
                    F.col(f"{prefix}_hi") % 65536,
                    (F.col(f"{prefix}_hi") / 65536).cast("long"),
                )
            ).alias("band_idx", "band_val"),
        )

    new_bands = explode_bands(new_hashes, "new")
    corpus_bands = explode_bands(corpus_hashes, "corpus")
    cand = (
        corpus_bands.join(
            F.broadcast(new_bands), ["band_idx", "band_val"]
        )
        .select("new_id", "corpus_id", "new_hi", "new_lo", "corpus_hi", "corpus_lo")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    hamming = F.bit_count(F.expr("new_hi ^ corpus_hi")) + F.bit_count(
        F.expr("new_lo ^ corpus_lo")
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("new_id", "corpus_id", "hamming")
    )
