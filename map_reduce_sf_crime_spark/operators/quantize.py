"""Embedding quantization — symmetric int8 scalar quantization, the
storage/bandwidth-side operator of a large embedding store (4× smaller
than float32, 8× smaller than float64; ANN probe kernels dequantize
with one multiply).

Determinism: ``q_i = floor(x_i * 127 / max|x|)`` — floor, not round,
so there is no round-half mode to diverge between engines, and the
scale is derived from the vector itself (no global pass). Both
engines evaluate the identical IEEE-754 expression tree, so the
quantized codes hash-match the oracle bit-for-bit.

No reference counterpart (SURVEY §2.11 QZ1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int8_quantize_col(vec: Column) -> Column:
    """CSV-serialized int8 codes for an ``array<float>`` column (the
    driver canonicalizer can't sort array cells, so the registry form
    is the serialized string)."""
    linf = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-12),
    )
    codes = F.transform(
        vec, lambda x: F.floor(x.cast("double") * 127 / linf).cast("long")
    )
    return F.concat_ws(",", codes.cast("array<string>"))


def int8_scale_col(vec: Column) -> Column:
    """Dequantization scale (max|x| / 127), rounded 6dp JVM-side."""
    linf = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-12),
    )
    return F.round(linf / 127, 6)


def int8_quantize_sql(vec: str) -> str:
    linf = (
        f"greatest(list_max(list_transform({vec}, "
        f"x -> abs(x::double))), 1e-12)"
    )
    return (
        f"array_to_string(list_transform({vec}, "
        f"x -> cast(floor(x::double * 127 / {linf}) as bigint)), ',')"
    )


def int8_scale_sql(vec: str) -> str:
    linf = (
        f"greatest(list_max(list_transform({vec}, "
        f"x -> abs(x::double))), 1e-12)"
    )
    return f"round({linf} / 127, 6)"
