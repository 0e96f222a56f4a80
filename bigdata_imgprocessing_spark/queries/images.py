"""Image-pipeline queries: the reference's color/detection pipelines
(pyspark_dominant.py, pyspark_yolox.py) run over synthetic binary
images derived from the ``embeddings`` table, end-to-end through real
binary columns and Arrow pandas UDFs.

Why embeddings → images: the oracle must be able to recompute results
from the same parquet inputs, so each "image" is a 2x2x3 uint8 pixel
block deterministically derived from the first 12 embedding dims
(pixel_i = abs(trunc(dim_i * 1000)) % 256). The Spark side round-trips
through actual bytes (encode UDF → BinaryType column → decode UDF);
the oracle computes from the array directly — hash-equality proves the
whole binary path.

Scale: UDF stages are Arrow-batched and partition-parallel; the
aggregations after explode are ordinary shuffles. At 100 TB the binary
column comes from spark.read.format("binaryFile") over object storage
(see images/, sources/) and the pixel math is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType

from ..core.catalog import table
from ..core.registry import query
from ..images.codec import encode_image
from ..images.color import average_color_udf, dominant_color_udf
from ..images.detect import SCORE_THRESHOLD, detect_udf

# Adversarial-content JPEG fixture (VERDICT r7 item 3): an 8x8 GRAY
# block whose quantized DCT is sparse high-frequency — a >15-zero run
# reaching a |v|>=2 coefficient (correction-bit-only in the refinement
# scan) with a newly-significant |v|==1 after it — so the progressive
# encoder's ZRL/correction-bit span path (the r7 bug) and the baseline
# encoder's long AC zero runs sit under the DRIVER HASH, not only under
# local tests. Verified properties (tools run r8): for every DC shift
# c in [-64, 63], decode(encode(P+c)) == P+c bit-exactly for BOTH
# baseline and progressive codecs (integer luma plane, no chroma), the
# trigger pattern survives the shift, and mean(P) == 128 exactly, so
# the analytic oracle for a textured id is 64 + (first_byte % 128).
_TEXTURED_GRAY = np.array(
    [
        [128, 128, 128, 128, 128, 128, 128, 128],
        [127, 127, 127, 127, 127, 127, 127, 127],
        [129, 129, 129, 129, 129, 129, 129, 129],
        [126, 127, 126, 127, 126, 127, 126, 127],
        [130, 129, 130, 129, 130, 129, 130, 129],
        [127, 127, 127, 127, 127, 127, 127, 127],
        [129, 129, 129, 129, 129, 129, 129, 129],
        [128, 128, 128, 128, 128, 128, 128, 128],
    ],
    dtype=np.uint8,
)


@F.pandas_udf(BinaryType())
def _embedding_to_image_udf(emb: pd.Series) -> pd.Series:
    """First 12 dims → 2x2x3 uint8 FIMG bytes (deterministic, documented
    in the module docstring; the oracle mirrors the arithmetic)."""

    def enc(vec) -> bytes:
        v = np.asarray(vec[:12], dtype=np.float64) * 1000.0
        px = (np.abs(v.astype(np.int64)) % 256).astype(np.uint8).reshape(2, 2, 3)
        return encode_image(px)

    return emb.map(enc)


def _images(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").alias("img_id"),
        _embedding_to_image_udf(F.col("embedding")).alias("content"),
    )


@F.pandas_udf(BinaryType())
def _real_format_image_udf(vec_id: pd.Series, emb: pd.Series) -> pd.Series:
    """Same deterministic 2x2x3 pixels, but encoded as REAL on-disk
    formats — 24-bit BMP (id%3==0), 8-bit RGB PNG (id%3==1), and
    baseline JPEG (id%3==2) — so the decode side exercises all three
    stdlib format codecs, not the FIMG fixture container (P4
    real-format leg). The JPEG leg uses a FLAT GRAY image (all pixels =
    first embedding byte): with all-ones quantization a flat gray block
    is DC-only with integer coefficients AND its chroma is constant 128,
    so the lossy format round-trips BIT-EXACTLY under both 4:4:4 and
    chroma-subsampled encodings and the analytic oracle stays valid (the
    general-content error bounds live in tests/test_jpeg.py). Half the
    JPEG ids (id%6==2) encode as 4:2:0 at a non-MCU-multiple 10x6 size —
    the camera-default variant — so multi-block-MCU interleave, MCU-pad
    cropping, and nearest-neighbor chroma upsample all sit under the
    driver hash; the other half (id%6==5) stay 4:4:4 2x2. Each half
    further alternates baseline/PROGRESSIVE by id%12, so the SOF2
    multi-scan decoder (DC/AC first+refine scans, EOBn runs, the
    refinement ladder) is ALSO value-checked by the driver hash."""
    from ..images.formats import encode_bmp, encode_png
    from ..images.jpeg import encode_jpeg
    from ..images.jpeg_progressive import encode_jpeg_progressive

    def enc(row) -> bytes:
        vid, vec = row
        v = np.asarray(vec[:12], dtype=np.float64) * 1000.0
        px = (np.abs(v.astype(np.int64)) % 256).astype(np.uint8).reshape(2, 2, 3)
        m = vid % 3
        if m == 0:
            if vid % 6 == 3:
                # 32-bit BGRX leg (r8): same RGB pixels through the
                # 4-byte-pixel decode path — hash-identical by design
                return encode_bmp(px, bpp=32)
            return encode_bmp(px)
        if m == 1:
            if vid % 6 == 4:
                # Adam7-interlaced leg (r8): lossless, so the same
                # pixels exercise the seven-pass decode hash-identically
                return encode_png(px, interlace=True)
            return encode_png(px)
        g = int(px[0, 0, 0])
        if vid % 48 == 29:
            # LOSSLESS (SOF3) leg: exact for ARBITRARY content by
            # construction, so it carries the full 2x2x3 pixel block —
            # the only JPEG slot whose driver-hash content is not
            # flat/structured (oracle = the BMP/PNG pixel arithmetic)
            from ..images.jpeg_lossless import encode_jpeg_lossless

            return encode_jpeg_lossless(px, predictor=4)
        if vid % 48 == 35:
            # Adobe CMYK leg (transform 0, K=255): flat per-channel
            # planes are DC-only/exact and R,G,B = stored C,M,Y — the
            # analytic oracle is the three pixel bytes directly
            from ..images.jpeg import encode_jpeg_cmyk

            cmyk = np.empty((2, 2, 4), dtype=np.uint8)
            cmyk[:, :, 0] = px[0, 0, 0]
            cmyk[:, :, 1] = px[0, 0, 1]
            cmyk[:, :, 2] = px[0, 0, 2]
            cmyk[:, :, 3] = 255
            return encode_jpeg_cmyk(cmyk, transform=0)
        if vid % 48 == 44:
            # 12-bit Adobe CMYK leg (r9 — the last plumbing gate): flat
            # C,M,Y at mid-bin 12-bit values (px*16 + 8) with K=4095
            # (no ink), so the inverted-CMYK identity is a multiply by
            # one and >>4 recovers the pixel bytes exactly (verified
            # exact for both transforms over random flat colors);
            # alternates direct CMYK / YCCK by vid % 96. Checked BEFORE
            # the %6==2 4:2:0 branch, whose residue class it borrows.
            from ..images.jpeg import encode_jpeg_12bit

            cmyk12 = np.zeros((2, 2, 4), dtype=np.uint16)
            cmyk12[:, :, 0] = int(px[0, 0, 0]) * 16 + 8
            cmyk12[:, :, 1] = int(px[0, 0, 1]) * 16 + 8
            cmyk12[:, :, 2] = int(px[0, 0, 2]) * 16 + 8
            cmyk12[:, :, 3] = 4095
            return encode_jpeg_12bit(
                cmyk12, transform=0 if vid % 96 == 44 else 2
            )
        enc_fn = encode_jpeg if vid % 12 < 6 else encode_jpeg_progressive
        if vid % 6 == 2:
            return enc_fn(
                np.full((10, 6, 3), g, dtype=np.uint8), subsampling="420"
            )
        if vid % 24 in (17, 23):
            # adversarial leg: textured GRAY 8x8 with a DC shift derived
            # from the embedding byte — sparse high-frequency content
            # that drives the AC/EOB/ZRL-refinement encoder paths while
            # staying bit-exact (see _TEXTURED_GRAY above); %24==17
            # baseline, %24==23 progressive
            t = (_TEXTURED_GRAY.astype(np.int64) + (g % 128 - 64)).astype(
                np.uint8
            )
            return enc_fn(t)
        if vid % 48 == 5:
            # PARTIALLY interleaved scan script (luma scan + Cb+Cr pair
            # scan): flat gray is exact under any script, so this slot
            # is hash-identical to its full-interleave sibling while
            # putting the 1 < Ns < Nf decode path under the driver hash
            return encode_jpeg(
                np.full((2, 2, 3), g, dtype=np.uint8), scan_mode="partial"
            )
        if vid % 48 == 11:
            # 12-bit SOF1 COLOR leg (r8): flat RGB at mid-bin 12-bit
            # values (px*16 + 8), so the >>4 output contract recovers
            # the three pixel bytes exactly (flat DC reconstruction
            # error << 8) — oracle is _px(1..3) directly
            from ..images.jpeg import encode_jpeg_12bit

            v12 = np.zeros((2, 2, 3), dtype=np.uint16)
            v12[:, :] = px[0, 0].astype(np.uint16) * 16 + 8
            return encode_jpeg_12bit(v12)
        return enc_fn(np.full((2, 2, 3), g, dtype=np.uint8))

    return pd.Series(map(enc, zip(vec_id, emb)))


_DUCK_PX = "(abs(trunc(embedding[{i}]::DOUBLE * 1000)::BIGINT) % 256)"


def _px(i: int) -> str:  # 1-based embedding index
    return _DUCK_PX.format(i=i)


@query(
    "image_avg_color",
    oracle=f"""
    SELECT vec_id AS img_id,
           ({_px(1)} + {_px(4)} + {_px(7)} + {_px(10)}) / 4.0 AS c0,
           ({_px(2)} + {_px(5)} + {_px(8)} + {_px(11)}) / 4.0 AS c1,
           ({_px(3)} + {_px(6)} + {_px(9)} + {_px(12)}) / 4.0 AS c2
    FROM embeddings
    """,
)
def image_avg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 average color through the full binary round trip: encode UDF →
    BinaryType column → decode UDF → per-channel means (exact .25-step
    doubles → exact parity)."""
    imgs = _images(spark, sf_dir)
    avg = imgs.select("img_id", average_color_udf("content").alias("avg"))
    return avg.select(
        "img_id",
        F.element_at("avg", 1).alias("c0"),
        F.element_at("avg", 2).alias("c1"),
        F.element_at("avg", 3).alias("c2"),
    )


@query(
    "image_dominant_hist",
    oracle=f"""
    WITH px AS (
        SELECT vec_id,
               unnest([
                   {{'p': 0, 'c0': {_px(1)},  'c1': {_px(2)},  'c2': {_px(3)}}},
                   {{'p': 1, 'c0': {_px(4)},  'c1': {_px(5)},  'c2': {_px(6)}}},
                   {{'p': 2, 'c0': {_px(7)},  'c1': {_px(8)},  'c2': {_px(9)}}},
                   {{'p': 3, 'c0': {_px(10)}, 'c1': {_px(11)}, 'c2': {_px(12)}}}
               ]) AS pix
        FROM embeddings
    ), vals AS (
        SELECT vec_id, pix.p AS p, pix.c0 AS c0, pix.c1 AS c1, pix.c2 AS c2,
               pix.c0 + pix.c1 + pix.c2 AS s
        FROM px
    ), grouped AS (
        SELECT vec_id, c0, c1, c2, count(*) AS cnt, min(s) AS s, min(p) AS first_p
        FROM vals GROUP BY vec_id, c0, c1, c2
    ), winner AS (
        SELECT vec_id, c0, c1, c2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cnt DESC, s ASC, first_p ASC) AS rn
        FROM grouped
    )
    SELECT c0, c1, c2, count(*) AS n_images
    FROM winner WHERE rn = 1 GROUP BY c0, c1, c2
    """,
)
def image_dominant_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 dominant color (per-image k-means, k=4) + A8 histogram. On 2x2
    images the deterministic k-means degenerates to most-frequent pixel
    with darkest-first tie-break, which the oracle states in SQL — so
    even the clustering UDF is value-checked. The reference computes this
    histogram via collect→np.unique→parallelize (pyspark_dominant.py:
    74-92); here it's one groupBy."""
    imgs = _images(spark, sf_dir)
    dom = imgs.select("img_id", dominant_color_udf("content").alias("dom"))
    return (
        dom.select(
            F.element_at("dom", 1).alias("c0"),
            F.element_at("dom", 2).alias("c1"),
            F.element_at("dom", 3).alias("c2"),
        )
        .groupBy("c0", "c1", "c2")
        .agg(F.count("*").alias("n_images"))
    )


@query(
    "image_format_ingest",
    oracle=f"""
    SELECT label,
           count(*) AS n_images,
           CAST(count(*) FILTER (WHERE vec_id % 3 = 0) AS BIGINT) AS n_bmp,
           CAST(count(*) FILTER (WHERE vec_id % 3 = 1) AS BIGINT) AS n_png,
           CAST(count(*) FILTER (WHERE vec_id % 3 = 2) AS BIGINT) AS n_jpg,
           round(avg(CASE WHEN vec_id % 24 IN (17, 23) THEN 64 + ({_px(1)} % 128)
                     WHEN vec_id % 48 = 29 THEN ({_px(1)} + {_px(4)} + {_px(7)} + {_px(10)}) / 4.0
                     WHEN vec_id % 3 = 2 THEN {_px(1)}
                     ELSE ({_px(1)} + {_px(4)} + {_px(7)} + {_px(10)}) / 4.0 END), 4) AS avg_c0,
           round(avg(CASE WHEN vec_id % 24 IN (17, 23) THEN 64 + ({_px(1)} % 128)
                     WHEN vec_id % 48 = 29 THEN ({_px(2)} + {_px(5)} + {_px(8)} + {_px(11)}) / 4.0
                     WHEN vec_id % 48 IN (35, 11, 44) THEN {_px(2)}
                     WHEN vec_id % 3 = 2 THEN {_px(1)}
                     ELSE ({_px(2)} + {_px(5)} + {_px(8)} + {_px(11)}) / 4.0 END), 4) AS avg_c1,
           round(avg(CASE WHEN vec_id % 24 IN (17, 23) THEN 64 + ({_px(1)} % 128)
                     WHEN vec_id % 48 = 29 THEN ({_px(3)} + {_px(6)} + {_px(9)} + {_px(12)}) / 4.0
                     WHEN vec_id % 48 IN (35, 11, 44) THEN {_px(3)}
                     WHEN vec_id % 3 = 2 THEN {_px(1)}
                     ELSE ({_px(3)} + {_px(6)} + {_px(9)} + {_px(12)}) / 4.0 END), 4) AS avg_c2
    FROM embeddings GROUP BY label
    """,
)
def image_format_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 with REAL formats: a mixed corpus of genuine 24-bit BMP,
    8-bit PNG, and baseline JPEG bytes (ALL stdlib codecs, no cv2 —
    images/formats.py + images/jpeg.py) flows binary-column →
    magic-dispatch decode → per-channel means → per-label rollup. Hash
    parity against the pixel-arithmetic oracle proves every
    encode→decode round trip is byte-exact (a BGR swap, row-flip,
    padding, zlib-filter, JPEG DC, or chroma-upsample bug anywhere
    breaks the values); the JPEG leg is flat-gray by construction so
    the lossy format — including its 4:2:0 chroma-subsampled half —
    sits under the exact gate too (see _real_format_image_udf). Since
    r8 the 4:4:4 slots additionally carry an ADVERSARIAL textured leg
    (vec_id % 24 in (17, 23)): a sparse high-frequency gray block that
    drives the AC zero-run / EOBn / progressive-refinement ZRL paths —
    the ones the r7 encoder bug hid from flat fixtures — while staying
    bit-exact under the analytic oracle (_TEXTURED_GRAY); and the
    r8-native decode paths each hold a hash-checked slot: LOSSLESS
    SOF3 with full arbitrary pixel content (%48==29 — exact by
    construction), Adobe CMYK with flat per-channel planes (%48==35 —
    RGB = stored C,M,Y at K=255), the partially interleaved scan
    script on flat gray (%48==5), 12-bit SOF1 COLOR at mid-bin
    12-bit values so the >>4 contract recovers the pixel bytes
    exactly (%48==11), and (r9) 12-bit Adobe CMYK/YCCK at the same
    mid-bin values with K=4095 (%48==44 — the last plumbing gate
    closed; direct/YCCK alternate by %96). Mirrors the
    reference's cv2.imdecode *.jpg ingest (pyspark_dominant.py:33-35)
    where formats also vary per file."""
    e = table(spark, sf_dir, "embeddings")
    imgs = e.select(
        "vec_id",
        "label",
        _real_format_image_udf("vec_id", "embedding").alias("content"),
    )
    avg = imgs.select(
        "vec_id", "label", average_color_udf("content").alias("avg")
    )
    return avg.groupBy("label").agg(
        F.count("*").alias("n_images"),
        F.sum((F.col("vec_id") % 3 == 0).cast("long")).alias("n_bmp"),
        F.sum((F.col("vec_id") % 3 == 1).cast("long")).alias("n_png"),
        F.sum((F.col("vec_id") % 3 == 2).cast("long")).alias("n_jpg"),
        F.round(F.avg(F.element_at("avg", 1)), 4).alias("avg_c0"),
        F.round(F.avg(F.element_at("avg", 2)), 4).alias("avg_c1"),
        F.round(F.avg(F.element_at("avg", 3)), 4).alias("avg_c2"),
    )


@query(
    "image_detection_counts",
    oracle=f"""
    WITH imgs AS (SELECT CAST(vec_id AS VARCHAR) AS img_id FROM embeddings),
    dets AS (
        SELECT img_id,
               CAST(('0x' || substr(md5(img_id || '_' || CAST(j + 1 AS VARCHAR)), 1, 10))::UBIGINT % 80 AS INTEGER) AS class_id,
               (('0x' || substr(md5(img_id || '_s' || CAST(j + 1 AS VARCHAR)), 1, 10))::UBIGINT % 1000) / 1000.0 AS score
        FROM imgs CROSS JOIN (SELECT unnest(range(3)) AS j) js
        WHERE j < ('0x' || substr(md5(img_id), 1, 10))::UBIGINT % 4
    )
    SELECT class_id,
           count(*) AS n_detections,
           count(DISTINCT img_id) AS n_images
    FROM dets WHERE score > {SCORE_THRESHOLD}
    GROUP BY class_id
    """,
)
def image_detection_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7: (stub) model inference → explode detections → score
    threshold → per-class counts. The reference does this via per-row
    Python closures + JSON strings (pyspark_yolox.py:90-111); here the
    detections are a real array<struct> column exploded JVM-side."""
    # ids only; the binary/encode stage is irrelevant to detection
    imgs = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("img_id")
    )
    dets = imgs.select("img_id", F.explode(detect_udf("img_id")).alias("det"))
    return (
        dets.where(F.col("det.score") > SCORE_THRESHOLD)
        .groupBy(F.col("det.class_id").alias("class_id"))
        .agg(
            F.count("*").alias("n_detections"),
            F.count_distinct("img_id").alias("n_images"),
        )
    )


# ---------------------------------------------------------------------------
# Static class dimension + per-image prediction strings — the reference's
# remaining detection-pipeline surfaces: the in-code class-name dim
# (coco_classes.py:1-82, S3; names here are synthetic class_NN) joined to
# detection counts (plots.py:24,34), and the per-image prediction table
# (pyspark_yolox.py:137-140) with the {class: count} measure emitted as a
# deterministic sorted-entry string (P7/P11; raw JSON map key order is
# engine-defined, which is why the map is serialized sorted).
# ---------------------------------------------------------------------------

N_CLASSES = 80


@query(
    "detection_class_names",
    oracle=f"""
    WITH imgs AS (SELECT CAST(vec_id AS VARCHAR) AS img_id FROM embeddings),
    dets AS (
        SELECT img_id,
               CAST(('0x' || substr(md5(img_id || '_' || CAST(j + 1 AS VARCHAR)), 1, 10))::UBIGINT % 80 AS INTEGER) AS class_id,
               (('0x' || substr(md5(img_id || '_s' || CAST(j + 1 AS VARCHAR)), 1, 10))::UBIGINT % 1000) / 1000.0 AS score
        FROM imgs CROSS JOIN (SELECT unnest(range(3)) AS j) js
        WHERE j < ('0x' || substr(md5(img_id), 1, 10))::UBIGINT % 4
    )
    SELECT printf('class_%02d', class_id) AS class_name,
           count(*) AS n_detections
    FROM dets WHERE score > {SCORE_THRESHOLD}
    GROUP BY class_name
    ORDER BY n_detections DESC, class_name
    LIMIT 10
    """,
)
def detection_class_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection counts joined to a broadcast static class-name dim
    (spark.createDataFrame over an in-code list — the S3 source kind),
    top-10 classes fully tie-broken."""
    class_dim = F.broadcast(
        spark.createDataFrame(
            [(i, f"class_{i:02d}") for i in range(N_CLASSES)],
            "class_id int, class_name string",
        )
    )
    # ids only; the binary/encode stage is irrelevant to detection
    imgs = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("img_id")
    )
    dets = imgs.select("img_id", F.explode(detect_udf("img_id")).alias("det"))
    counts = (
        dets.where(F.col("det.score") > SCORE_THRESHOLD)
        .groupBy(F.col("det.class_id").alias("class_id"))
        .agg(F.count("*").alias("n_detections"))
    )
    return (
        counts.join(class_dim, "class_id")
        .select("class_name", "n_detections")
        .orderBy(F.col("n_detections").desc(), "class_name")
        .limit(10)
    )


@query(
    "image_predictions",
    oracle=f"""
    WITH imgs AS (SELECT CAST(vec_id AS VARCHAR) AS img_id FROM embeddings),
    dets AS (
        SELECT img_id,
               CAST(('0x' || substr(md5(img_id || '_' || CAST(j + 1 AS VARCHAR)), 1, 10))::UBIGINT % 80 AS INTEGER) AS class_id,
               (('0x' || substr(md5(img_id || '_s' || CAST(j + 1 AS VARCHAR)), 1, 10))::UBIGINT % 1000) / 1000.0 AS score
        FROM imgs CROSS JOIN (SELECT unnest(range(3)) AS j) js
        WHERE j < ('0x' || substr(md5(img_id), 1, 10))::UBIGINT % 4
    ),
    cnt AS (
        SELECT img_id, class_id, count(*) AS c
        FROM dets WHERE score > {SCORE_THRESHOLD}
        GROUP BY img_id, class_id
    )
    SELECT i.img_id,
           coalesce(string_agg(CAST(cnt.class_id AS VARCHAR) || ':' || CAST(cnt.c AS VARCHAR),
                               ',' ORDER BY cnt.class_id), '') AS predictions
    FROM imgs i LEFT JOIN cnt ON i.img_id = cnt.img_id
    GROUP BY i.img_id
    """,
)
def image_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-image predictions table (id + {class: count} measure,
    pyspark_yolox.py:137-140) — empty-detection images keep '' like the
    reference's '{}' rows (pyspark_yolox.py:95-96)."""
    # ids only; the binary/encode stage is irrelevant to detection
    imgs = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("img_id")
    )
    dets = imgs.select("img_id", F.explode(detect_udf("img_id")).alias("det"))
    cnt = (
        dets.where(F.col("det.score") > SCORE_THRESHOLD)
        .groupBy("img_id", F.col("det.class_id").alias("class_id"))
        .agg(F.count("*").alias("c"))
    )
    per_img = cnt.groupBy("img_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("class_id", "c"))),
                lambda s: F.concat_ws(":", s.class_id, s.c),
            ),
            ",",
        ).alias("predictions")
    )
    return imgs.join(per_img, "img_id", "left").select(
        "img_id", F.coalesce("predictions", F.lit("")).alias("predictions")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup detection (image dedup for a training corpus)
# ---------------------------------------------------------------------------

_PH_MEAN = "(" + " + ".join(_DUCK_PX.format(i=i) for i in range(1, 13)) + ") / 12.0"
_PH_HASH = "(" + " + ".join(
    f"(CASE WHEN {_DUCK_PX.format(i=i + 1)}::DOUBLE >= m THEN {1 << i} ELSE 0 END)"
    for i in range(12)
) + ")"


@query(
    "image_phash_neardup",
    oracle=f"""
    WITH m0 AS (
        SELECT vec_id AS img_id, {_PH_MEAN} AS m, embedding FROM embeddings
    ), hashes AS (
        SELECT img_id, {_PH_HASH} AS ph FROM m0
    ), bands AS (
        SELECT img_id, ph, b, (ph >> (4 * b)) & 15 AS bv
        FROM hashes, unnest([0, 1, 2]) t(b)
    ), pairs AS (
        SELECT DISTINCT a.img_id AS ia, b.img_id AS ib, a.ph AS pa, b.ph AS pb
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.img_id < b.img_id
    )
    SELECT bit_count(xor(pa, pb)) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs WHERE bit_count(xor(pa, pb)) <= 2
    GROUP BY hamming
    """,
)
def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual hash: mean-threshold
    aHash per image (computed from DECODED bytes — the binary round trip
    is inside the checked hash), banded-LSH candidate generation (3
    bands x 4 bits: a near-dup pair differing in <= 2 bits must agree on
    at least one whole band), hamming-verified pairs histogrammed.

    The image-side twin of ``minhash_lsh_pairs``: candidates come from a
    bucketed band self-EQUI-join — never an all-pairs comparison — and
    the verify stage is one integer xor/popcount per candidate. At 100
    TB the hash is 64-bit over 8x8 downsampled luma (same UDF shape),
    bands widen to 4 x 16 bits, and the band join's bucket sizes stay
    bounded by true near-dup cluster sizes, not corpus size. The hash
    frame is cached: band explode + both join sides reuse one UDF pass
    over the corpus."""
    from ..core.session import cache_parallelism
    from ..images.fingerprint import phash_udf

    imgs = _images(spark, sf_dir)
    hashes = (
        imgs.select("img_id", phash_udf("content").alias("ph"))
        .coalesce(cache_parallelism(spark))
        .cache()
    )
    bands = hashes.select(
        "img_id", "ph", F.explode(F.array(*[F.lit(b) for b in range(3)])).alias("b")
    ).withColumn("bv", F.expr("shiftright(ph, 4 * b) & 15"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("ia"),
            F.col("b.img_id").alias("ib"),
            F.col("a.ph").alias("pa"),
            F.col("b.ph").alias("pb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        pairs.select(ham.alias("hamming"))
        .where(F.col("hamming") <= 2)
        .groupBy("hamming")
        .agg(F.count("*").alias("n_pairs"))
    )


@F.pandas_udf(ArrayType(DoubleType()))
def _safe_avg_color_udf(content: pd.Series) -> pd.Series:
    """Quarantining decode: corrupt buffers yield NULL instead of
    failing the task — the binary-column twin of the JSON reader's
    PERMISSIVE mode (``jsonl_corrupt_handling``). Real ingest at 100 TB
    ALWAYS contains truncated blobs; one bad byte must cost one null
    row, not a stage retry storm."""
    from ..images.color import _avg_color

    def safe(buf):
        try:
            return _avg_color(buf)
        except Exception:
            return None

    return content.map(safe)


@query(
    "image_corrupt_quarantine",
    oracle=f"""
    SELECT label,
           count(*) AS n_images,
           CAST(count(*) FILTER (WHERE vec_id % 13 = 0) AS BIGINT) AS n_quarantined,
           round(sum(CASE WHEN vec_id % 13 != 0
                          THEN ({_px(1)} + {_px(4)} + {_px(7)} + {_px(10)}) / 4.0
                     END), 2) AS sum_c0_ok
    FROM embeddings GROUP BY label
    """,
)
def image_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-blob quarantine through the binary path: every 13th
    image's bytes are truncated mid-payload (a torn upload), the decode
    UDF returns NULL for them instead of throwing, and the per-label
    rollup counts quarantined rows next to the aggregate computed over
    the SURVIVORS only. Hash parity proves the quarantine boundary is
    exact — no good image dropped, no corrupt image silently averaged
    in. Mirrors ``jsonl_corrupt_handling``'s PERMISSIVE accounting for
    the multimodal column."""
    e = table(spark, sf_dir, "embeddings")
    raw = e.select(
        "vec_id", "label", _embedding_to_image_udf("embedding").alias("content")
    )
    corrupted = raw.select(
        "vec_id",
        "label",
        F.when(
            F.col("vec_id") % 13 == 0,
            F.expr("substring(content, 1, 9)"),  # torn: header + partial pixels
        )
        .otherwise(F.col("content"))
        .alias("content"),
    )
    avg = corrupted.select(
        "vec_id", "label", _safe_avg_color_udf("content").alias("avg")
    )
    return avg.groupBy("label").agg(
        F.count("*").alias("n_images"),
        F.sum(F.col("avg").isNull().cast("long")).alias("n_quarantined"),
        F.round(F.sum(F.element_at("avg", 1)), 2).alias("sum_c0_ok"),
    )
