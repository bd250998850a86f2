"""M5 — per-row image payload validation (north-rule invariant).

``input_hint``: decoded pixels must match the reference payload at
PSNR ≥ 40 dB for lossy codecs / exactly for lossless, plus exact caption
equality. The check is a broadcast-free co-partitioned join on ``image_id``
followed by one Arrow pass over (bytes, fmt) pairs — at 100 TB both sides
are bucketed by image_id so the join is shuffle-local.

Columns appended: ``psnr_db:double`` (1e9 sentinel = identical pixels),
``pixels_ok:boolean``, ``caption_ok:boolean``, ``payload_ok:boolean``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DoubleType, StructField,
                               StructType)

_VALIDATE_TYPE = StructType([
    StructField("psnr_db", DoubleType()),
    StructField("pixels_ok", BooleanType()),
])


@F.pandas_udf(_VALIDATE_TYPE)
def _udf_validate_pixels(byts: pd.Series, fmts: pd.Series,
                         ref_byts: pd.Series, ref_fmts: pd.Series) -> pd.DataFrame:
    import numpy as np

    from ..functions import image

    psnrs, oks = [], []
    for b, f, rb, rf in zip(byts.to_numpy(), fmts.to_numpy(),
                            ref_byts.to_numpy(), ref_fmts.to_numpy()):
        if b is None or rb is None:
            psnrs.append(None)
            oks.append(False)
            continue
        got, ref = image.decode_image(b, f), image.decode_image(rb, rf)
        if got.shape != ref.shape:
            psnrs.append(0.0)
            oks.append(False)
            continue
        p = min(image.psnr(got, ref), 1e9)
        psnrs.append(p)
        oks.append(bool(np.array_equal(got, ref)) if f in ("raw", "bmp")
                   else p >= 40.0)
    return pd.DataFrame({"psnr_db": pd.Series(psnrs, dtype="float64"),
                         "pixels_ok": oks})


def validate_payloads(got: DataFrame, reference: DataFrame) -> DataFrame:
    """Join ``got`` against ``reference`` on image_id and validate each row.

    Both inputs need (image_id, bytes, fmt, caption). Inner join: rows absent
    from the reference are reported separately by the caller via left_anti.
    """
    ref = reference.select(
        F.col("image_id"),
        F.col("bytes").alias("ref_bytes"),
        F.col("fmt").alias("ref_fmt"),
        F.col("caption").alias("ref_caption"),
    )
    j = got.join(ref, "image_id")
    v = _udf_validate_pixels("bytes", "fmt", "ref_bytes", "ref_fmt")
    return (j.withColumn("_v", v)
             .withColumn("psnr_db", F.col("_v.psnr_db"))
             .withColumn("pixels_ok", F.col("_v.pixels_ok"))
             .withColumn("caption_ok",
                         F.coalesce(F.col("caption") == F.col("ref_caption"),
                                    F.lit(False)))
             .withColumn("payload_ok", F.col("pixels_ok") & F.col("caption_ok"))
             .drop("_v", "ref_bytes", "ref_fmt", "ref_caption"))
