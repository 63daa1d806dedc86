"""Binary media decode/feature queries (PNG/JPEG/GIF/TIFF/WAV...)."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark_graph_spark.session import (
    default_parallelism as _default_parallelism,
)

from pyspark_graph_spark.queries._registry import query


def _audio_spectral_sql(bins: tuple) -> str:
    """Replays decode-free: the WAV payload formula (sample g =
    (id*31 + g*7) % 201 - 100, n = id%192 + 64 — attach_wav_media's
    contract) is projected onto each DFT bin with the same left-
    associative trig arguments the NumPy side uses. Output is log10-
    compressed before rounding so cross-engine summation-order drift
    (~1e-7 relative on the raw powers) sits ~6 orders of magnitude below
    the 6-dp rounding grid instead of adjacent to a 4-dp one."""
    n = "(doc_id % 192 + 64)"
    x = "CAST((doc_id*31 + (f*64 + k)*7) % 201 - 100 AS DOUBLE)"
    cols = []
    for b in bins:
        c = f"list_sum(list_transform(range(0, 64), k -> {x} * cos(2*pi()*{b}*k/64)))"
        s = f"list_sum(list_transform(range(0, 64), k -> {x} * sin(2*pi()*{b}*k/64)))"
        p = (
            f"list_sum(list_transform(range(0, {n} // 64), f -> "
            f"power({c}, 2) + power({s}, 2)))"
        )
        cols.append(f"ROUND(log10(1 + ROUND({p}, 4)), 6) AS lp{b}")
    cols_sql = ",\n       ".join(cols)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST({n} // 64 AS INT) AS n_frames,
       {cols_sql}
FROM documents
"""

def _audio_fp_sql(bins: tuple, max_frames: int) -> str:
    """Per-frame DFT powers as CTE columns (rounded 4), then the delta
    bits folded over the (frame, bin) order with nfr guards."""
    x = "CAST((doc_id*31 + ({f}*64 + k)*7) % 201 - 100 AS DOUBLE)"
    pcols = []
    for f in range(max_frames):
        for b in bins:
            xf = x.format(f=f)
            c = (
                f"list_sum(list_transform(range(0, 64), "
                f"k -> {xf} * cos(2*pi()*{b}*k/64)))"
            )
            s = (
                f"list_sum(list_transform(range(0, 64), "
                f"k -> {xf} * sin(2*pi()*{b}*k/64)))"
            )
            pcols.append(
                f"ROUND(POWER({c}, 2) + POWER({s}, 2), 4) AS p_{f}_{b}"
            )
    bits = "0"
    for f in range(1, max_frames):
        for b in bins:
            bit = f"CASE WHEN p_{f}_{b} > p_{f - 1}_{b} THEN 1 ELSE 0 END"
            bits = (
                f"CASE WHEN {f} < nfr THEN ({bits}) * 2 + {bit} "
                f"ELSE ({bits}) END"
            )
    pcols_sql = ",\n       ".join(pcols)
    return f"""
WITH p AS (
    SELECT doc_id, LEAST((doc_id % 192 + 64) // 64, {max_frames}) AS nfr,
       {pcols_sql}
    FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(nfr AS INT) AS n_frames_used,
       CAST({bits} AS BIGINT) AS fingerprint
FROM p
"""

@query(
    "multimodal_decode",
    # fake codec = sha256 hex of the id repeated 4x (256 ASCII bytes) tiled
    # to width*height; mean = integer mean of the tiled byte values.  The
    # oracle recomputes it in closed form: full-tile chunks * chunk_sum +
    # the remainder prefix, so DuckDB never materializes w*h elements.
    oracle="""
WITH m AS (
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(doc_id % 64 + 16 AS INT) AS width,
           CAST(doc_id % 48 + 16 AS INT) AS height,
           repeat(sha256(CAST(doc_id AS VARCHAR)), 4) AS s
    FROM documents
), t AS (
    SELECT media_id, width, height, s,
           CAST(width AS BIGINT) * height AS n,
           list_sum(list_transform(range(0, 256),
                                   k -> ord(substr(s, CAST(k AS INT) + 1, 1))))
             AS chunk_sum
    FROM m
)
SELECT media_id, width, height,
       CAST(((n // 256) * chunk_sum
             + COALESCE(list_sum(list_transform(range(0, n % 256),
                     k -> ord(substr(s, CAST(k AS INT) + 1, 1)))), 0))
            // n AS BIGINT) AS mean_intensity
FROM t
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media plumbing: synthesize media blobs from doc ids, decode
    via Arrow-batched mapInPandas (deterministic fake codec), return frame
    features.  The 'fake' codec is still a real byte-level contract (sha256
    ASCII tile), so the DuckDB oracle value-checks the full decode path."""
    from pyspark_graph_spark.multimodal import attach_fake_media, decode_images
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_fake_media(docs, "doc_id"))

@query(
    "multimodal_decode_pgm",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(doc_id % 48 + 16 AS INT) AS width,
       CAST(doc_id % 32 + 16 AS INT) AS height,
       CAST(list_sum(list_transform(
                range(0, (doc_id % 48 + 16) * (doc_id % 32 + 16)),
                k -> (doc_id + k) % 256))
            // ((doc_id % 48 + 16) * (doc_id % 32 + 16)) AS BIGINT)
         AS mean_intensity
FROM documents
""",
)
def q_multimodal_decode_pgm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: standards-conforming binary PGM (P5)
    streams are synthesized JVM-side from doc ids, then the pure-NumPy
    decoder parses each header and payload inside Arrow-batched
    mapInPandas. Width/height come from the parsed bytes and the payload
    is ``(id + k) % 256``, so the oracle recomputes every feature with
    integer arithmetic — a wrong header parse, stride, or mean shows up as
    a value mismatch."""
    from pyspark_graph_spark.multimodal import attach_pgm_media, decode_images
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_pgm_media(docs, "doc_id"))

@query(
    "multimodal_decode_wav",
    oracle="""
WITH feat AS (
    SELECT doc_id,
           (doc_id % 192) + 64 AS n,
           list_transform(range(0, (doc_id % 192) + 64),
                          k -> ((doc_id * 31 + k * 7) % 201) - 100) AS s
    FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(8000 AS INT) AS sample_rate,
       CAST(list_sum(list_transform(s, x -> abs(x))) // n AS BIGINT)
         AS mean_abs,
       CAST(COALESCE(list_sum(list_transform(range(0, n - 1),
                k -> CASE WHEN sign(s[k + 1]) * sign(s[k + 2]) = -1
                          THEN 1 ELSE 0 END)), 0) AS BIGINT)
         AS n_sign_changes
FROM feat
""",
)
def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: standards-conforming PCM16 mono WAV
    streams (44-byte RIFF header + little-endian payload) are synthesized
    JVM-side from doc ids, then the pure-NumPy decoder walks the RIFF
    chunks inside Arrow-batched mapInPandas. Sample k is
    ``((id*31 + k*7) % 201) - 100``, so the oracle recomputes n_samples,
    integer mean |amplitude| and strict zero-crossing count with integer
    arithmetic — a wrong chunk walk, endianness, or two's-complement
    decode mismatches values loudly."""
    from pyspark_graph_spark.multimodal import attach_wav_media, decode_audio
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").repartition(
        _default_parallelism(spark)
    )
    return decode_audio(attach_wav_media(docs, "doc_id"))

@query(
    "multimodal_frames",
    oracle="""
WITH vids AS (
    SELECT doc_id,
           (doc_id % 24) + 8 AS w,
           (doc_id % 16) + 8 AS h,
           (doc_id % 4) + 2 AS n_frames
    FROM documents
),
sampled AS (
    SELECT doc_id, w, h, unnest(range(0, n_frames, 2)) AS f
    FROM vids
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(f AS INT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(list_sum(list_transform(range(0, w * h),
                k -> (doc_id + f * 7 + k) % 256)) // (w * h) AS BIGINT)
         AS mean_intensity
FROM sampled
""",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling WITH real decode: multi-frame
    concatenated-P5 streams are synthesized JVM-side, then every 2nd frame
    is located by walking successive headers and decoded to features in a
    single Arrow mapInPandas pass (skipped frames never materialize).
    Frame f pixel k is ``(id + 7f + k) % 256`` — the oracle recomputes
    each sampled frame's integer mean intensity."""
    from pyspark_graph_spark.multimodal import attach_pgm_video, extract_frames
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").repartition(
        _default_parallelism(spark)
    )
    return extract_frames(attach_pgm_video(docs, "doc_id"), every_n=2)

# ---------------------------------------------------------------------------
# Real PNG decode (multimodal/binary_ops.py)
# ---------------------------------------------------------------------------
@query(
    "multimodal_decode_png",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(doc_id % 48 + 16 AS INT) AS width,
       CAST(doc_id % 32 + 16 AS INT) AS height,
       CAST(list_sum(list_transform(
                range(0, (doc_id % 48 + 16) * (doc_id % 32 + 16)),
                k -> (doc_id + k) % 256))
            // ((doc_id % 48 + 16) * (doc_id % 32 + 16)) AS BIGINT)
         AS mean_intensity
FROM documents
""",
)
def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode end-to-end: standards-conforming 8-bit
    grayscale PNGs (zlib DEFLATE, scanline filters cycling through all
    five types) are synthesized from doc ids, then decoded with only the
    standard library inside Arrow-batched mapInPandas — chunk walk,
    inflate, and the full None/Sub/Up/Average/Paeth reconstruction.
    Pixels follow the same integer formula as the PGM fixtures, so the
    oracle recomputes every decoded feature; a wrong filter
    reconstruction or inflate shows up as a value mismatch."""
    from pyspark_graph_spark.multimodal import attach_png_media, decode_images
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_png_media(docs, "doc_id"))

@query(
    "multimodal_decode_gif",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(doc_id % 24 + 8 AS INT) AS width,
       CAST(doc_id % 16 + 8 AS INT) AS height,
       CAST(list_sum(list_transform(
                range(0, (doc_id % 24 + 8) * (doc_id % 16 + 8)),
                k -> ((doc_id + k) % 4) * 85))
            // ((doc_id % 24 + 8) * (doc_id % 16 + 8)) AS BIGINT)
         AS mean_intensity
FROM documents
""",
)
def q_multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end-to-end: standards-conforming GIF87a streams
    (4-color palette, genuine variable-width LZW with dictionary resets)
    are synthesized per document id, then parsed back — container, color
    table, sub-blocks, LZW — inside Arrow-batched mapInPandas. Pixel k has
    palette index (id+k)%4 → intensity index*85, so the oracle recomputes
    every feature with integer arithmetic; a wrong LZW width transition or
    palette lookup shows up as a value mismatch."""
    from pyspark_graph_spark.multimodal import decode_images
    from pyspark_graph_spark.multimodal.gif_ops import attach_gif_media
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_gif_media(docs, "doc_id"))

@query("audio_spectral", oracle=_audio_spectral_sql(bins=(0, 1, 4, 8)))
def q_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed DFT-bin spectral fingerprints of REAL PCM16 WAV streams:
    RIFF container parsed from bytes, 64-sample frames, power at the DC /
    low / mid / high bins — the cheap spectral feature stage of an audio
    corpus pipeline, one Arrow hop. Oracle recomputes every projection
    from the payload formula."""
    from pyspark_graph_spark.multimodal.audio_ops import (
        attach_wav_media,
        spectral_features,
    )
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = spectral_features(attach_wav_media(docs, "doc_id"))
    return out.select(
        "media_id",
        "n_frames",
        *[
            F.round(F.log10(1 + F.col(f"p{b}")), 6).alias(f"lp{b}")
            for b in (0, 1, 4, 8)
        ],
    )

@query(
    "image_thumbnail",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(doc_id % 48 + 16 AS INT) AS width,
       CAST(doc_id % 32 + 16 AS INT) AS height,
       CAST(list_sum(list_transform(range(0, 16),
            t -> (doc_id
                  + (((t // 4) * (doc_id % 32 + 16)) // 4)
                      * (doc_id % 48 + 16)
                  + (((t % 4) * (doc_id % 48 + 16)) // 4)) % 256))
           AS BIGINT) AS thumb_sum,
       CAST(doc_id % 256 AS INT) AS top_left,
       CAST((doc_id
             + ((3 * (doc_id % 32 + 16)) // 4) * (doc_id % 48 + 16)
             + ((3 * (doc_id % 48 + 16)) // 4)) % 256 AS INT)
           AS bottom_right
FROM documents
""",
)
def q_image_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 4×4 thumbnailing of REAL decoded PGM streams in
    one Arrow hop: the oracle replays the exact strided pixel picks
    (pixel(r,c) = (id + r*w + c) % 256) with integer arithmetic, so a
    wrong stride, axis order, or off-by-one in the resize indexing shows
    up as a value mismatch — the resize plumbing proof for the multimodal
    pipeline."""
    from pyspark_graph_spark.multimodal import attach_pgm_media
    from pyspark_graph_spark.multimodal.binary_ops import thumbnail_images
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return thumbnail_images(attach_pgm_media(docs, "doc_id"), target=4)

@query(
    "multimodal_decode_tiff",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(doc_id % 40 + 16 AS INT) AS width,
       CAST(doc_id % 24 + 16 AS INT) AS height,
       CAST(list_sum(list_transform(
                range(0, (doc_id % 40 + 16) * (doc_id % 24 + 16)),
                k -> (doc_id + k) % 256))
            // ((doc_id % 40 + 16) * (doc_id % 24 + 16)) AS BIGINT)
         AS mean_intensity
FROM documents
""",
)
def q_multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode end-to-end: standards-conforming little-endian
    baseline TIFF streams (pixel strip + hand-assembled 9-entry IFD) are
    synthesized JVM-side, then the pure-NumPy decoder walks the byte
    order, magic, IFD offset, tag table, and strip pointers inside Arrow
    mapInPandas. Payload byte k is (id + k) % 256, so the integer oracle
    recomputes every feature — a wrong endianness, tag type, or strip
    offset fails the hash."""
    from pyspark_graph_spark.multimodal.binary_ops import (
        attach_tiff_media,
        decode_images,
    )
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_tiff_media(docs, "doc_id"))

@query(
    "image_ahash",
    oracle="""
WITH px AS (
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           doc_id % 48 + 16 AS w, doc_id % 32 + 16 AS h,
           list_transform(range(0, 16),
               t -> (doc_id
                     + (((t // 4) * (doc_id % 32 + 16)) // 4)
                         * (doc_id % 48 + 16)
                     + (((t % 4) * (doc_id % 48 + 16)) // 4)) % 256)
               AS thumb
    FROM documents
),
m AS (
    SELECT media_id, thumb,
           list_sum(thumb) // 16 AS mean_px
    FROM px
)
SELECT media_id,
       CAST(list_reduce(
           list_transform(range(1, 17),
               i -> CASE WHEN thumb[i] >= mean_px THEN 1 ELSE 0 END),
           (a, b) -> a * 2 + b) AS BIGINT) AS ahash
FROM m
""",
)
def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) of every decoded PGM stream: 4×4
    nearest-neighbor thumbnail inside the decode Arrow hop, bit i set
    iff pixel_i >= integer thumbnail mean, packed MSB-first into one
    64-bit key — the image-dedup primitive (hamming-near keys ⇒ visually
    near images; bucket-join on the key exactly like SimHash text dedup).
    Oracle recomputes every strided pixel, the integer mean, and the bit
    fold."""
    from pyspark_graph_spark.multimodal import attach_pgm_media
    from pyspark_graph_spark.multimodal.binary_ops import perceptual_ahash
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return perceptual_ahash(attach_pgm_media(docs, "doc_id"), target=4)

@query("audio_fingerprint", oracle=_audio_fp_sql((1, 4, 8), 4))
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral-delta audio fingerprint of REAL decoded WAV streams: one
    bit per (consecutive-frame pair, landmark bin) recording whether the
    band's power rose — delta signs survive volume changes, the standard
    audio-dedup trick. Per-frame powers rounded before comparison so an
    engine ulp cannot flip a bit; the oracle recomputes every frame's
    DFT projection and the whole fold."""
    from pyspark_graph_spark.multimodal.audio_ops import (
        attach_wav_media,
        spectral_fingerprint,
    )
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return spectral_fingerprint(
        attach_wav_media(docs, "doc_id"), bins=(1, 4, 8), max_frames=4
    )

@query(
    "video_shot_boundaries",
    oracle="""
WITH vids AS (
    SELECT doc_id,
           (doc_id % 24) + 8 AS w,
           (doc_id % 16) + 8 AS h,
           (doc_id % 4) + 2 AS n_frames
    FROM documents
),
pairs AS (
    SELECT doc_id, w, h, unnest(range(1, n_frames)) AS f
    FROM vids
),
sad AS (
    SELECT doc_id, w, h, f,
           CAST(list_sum(list_transform(range(0, w * h),
                k -> abs(((doc_id + f * 7 + k) % 256)
                         - ((doc_id + (f - 1) * 7 + k) % 256))))
             AS BIGINT) AS s
    FROM pairs
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(f AS INT) AS frame_idx,
       s AS sum_abs_diff,
       s * 10 > 136 * w * h AS is_boundary
FROM sad
""",
)
def q_video_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over REAL multi-frame video streams:
    every frame decoded in one header-walking Arrow pass, consecutive
    frames differenced as integer sums of absolute pixel deltas, and the
    cut flag compared integer-exactly (sad·10 > 136·w·h ⇔ mean diff >
    13.6) — the first stage of any video-curation pipeline. Oracle
    recomputes every pixel delta from the frame formula."""
    from pyspark_graph_spark.multimodal import attach_pgm_video
    from pyspark_graph_spark.multimodal.binary_ops import shot_boundaries
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return shot_boundaries(
        attach_pgm_video(docs, "doc_id"), threshold_x10=136
    )

# ---------------------------------------------------------------------------
# Baseline JPEG decode (multimodal/jpeg_ops.py) — round 5
# ---------------------------------------------------------------------------
@query(
    "multimodal_decode_jpeg",
    oracle="""
WITH d AS (
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(doc_id % 41 + 24 AS BIGINT) AS w,
           CAST(doc_id % 29 + 24 AS BIGINT) AS h
    FROM documents
)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(list_sum(list_transform(
                range(0, ((w + 7) // 8) * ((h + 7) // 8)),
                b -> ((media_id * 7
                       + (b % ((w + 7) // 8)) * 13
                       + (b // ((w + 7) // 8)) * 31) % 200 + 28)
                     * LEAST(8, w - (b % ((w + 7) // 8)) * 8)
                     * LEAST(8, h - (b // ((w + 7) // 8)) * 8)))
            // (w * h) AS BIGINT) AS mean_intensity
FROM d
""",
)
def q_multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG (ITU-T T.81 SOF0) decode end-to-end: grayscale
    JPEGs (Annex-K Huffman tables, DC DPCM, zigzag AC, byte stuffing,
    restart markers on every third image) are synthesized from doc ids,
    then decoded inside Arrow-batched mapInPandas — marker walk, DHT
    canonical-Huffman build, entropy decode, dequantization, separable
    IDCT, level shift, edge-block crop. Fixture blocks are FLAT with the
    DC quant step at 8, which makes the lossy pipeline bit-exact (a
    DC-only block's IDCT is DC/8 + 128 at every pixel), so the oracle
    recomputes every decoded feature from the id formula; the AC/run-
    length path is pinned by unit tests against an independent IDCT."""
    from pyspark_graph_spark.multimodal.binary_ops import decode_images
    from pyspark_graph_spark.multimodal.jpeg_ops import attach_jpeg_media
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_jpeg_media(docs, "doc_id"))

@query(
    "multimodal_decode_jpeg_color",
    oracle="""
WITH d AS (
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(doc_id % 37 + 20 AS BIGINT) AS w,
           CAST(doc_id % 23 + 18 AS BIGINT) AS h
    FROM documents
)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(list_sum(list_transform(
                range(0, ((w + 7) // 8) * ((h + 7) // 8)),
                b -> ((media_id * 11
                       + (b % ((w + 7) // 8)) * 17
                       + (b // ((w + 7) // 8)) * 23) % 200 + 28)
                     * LEAST(8, w - (b % ((w + 7) // 8)) * 8)
                     * LEAST(8, h - (b // ((w + 7) // 8)) * 8)))
            // (w * h) AS BIGINT) AS mean_intensity
FROM d
""",
)
def q_multimodal_decode_jpeg_color(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL baseline COLOR JPEG decode end-to-end: 3-component YCbCr
    streams (4:2:0 for even doc ids, 4:4:4 for odd; restart markers on
    every fifth) synthesized from doc ids, decoded inside Arrow-batched
    mapInPandas — interleaved MCU walk, per-component Huffman tables and
    DC predictors, dequantization, IDCT, nearest-neighbor chroma
    upsampling, YCbCr->RGB, gray fold. Neutral chroma (Cb = Cr = 128)
    makes R = G = B = Y, so flat Y blocks keep the whole color pipeline
    bit-exact and the oracle recomputes every decoded feature from the Y
    formula; the oracle only iterates VISIBLE blocks, so it is sampling-
    agnostic (padded 4:2:0 edge blocks contribute zero visible pixels)."""
    from pyspark_graph_spark.multimodal.binary_ops import decode_images
    from pyspark_graph_spark.multimodal.jpeg_ops import (
        attach_jpeg_color_media,
    )
    from pyspark_graph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_jpeg_color_media(docs, "doc_id"))
