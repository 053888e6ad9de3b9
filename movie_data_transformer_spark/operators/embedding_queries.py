"""Embedding storage ops: per-vector affine int8 quantization (+ the
round-trip error audit) — the store-4x-smaller embedding-compression step
of a large-scale training-data pipeline (SURVEY.md §2.3 similarity
family; the reference engine has no embedding surface at all).

At 100 TB the embedding table dominates storage: 64 float32 dims per row
quantize to 64 int8 codes + two bigint scale anchors, cutting the column
~4x while keeping ANN pre-filters usable (IVF/PQ coarse scoring works on
dequantized micros). Everything here is exact integer arithmetic in the
repo's micro-unit convention (floor(v * 1e6) as BIGINT — the same
quantize step `similarity.ivf_assign_incremental` uses), so BOTH entries
carry full DuckDB oracles:

- `emb_int8_quantize`: per vector, vmin/vmax micro anchors and
  codes[i] = ((vm[i] - vmin) * 255) DIV (vmax - vmin)  (0 when the
  vector is constant). Pure integral floor-division — bit-identical in
  Spark (`div`) and DuckDB (`//`) for the non-negative operands here.
- `emb_int8_roundtrip`: 1-row corpus audit. Dequantize
  vm_hat[i] = vmin + (codes[i] * range) DIV 255 and check the per-vector
  error bound err <= range DIV 255 + 1 (floor-division algebra: with
  d = vm - vmin in [0, range], code = (d*255) DIV range implies
  0 <= d - (code*range) DIV 255 <= range DIV 255 + 1).

Scale notes: both are single-pass map-side jobs (no shuffle at all for
the quantize; one 1-row final agg for the audit). Expressions are single
`selectExpr` strings — the plan stays whole-stage-codegen JVM and the
driver builds one py4j expression per stage (NOTES.md r5 perf lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

_VM_EXPR = (
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)


def int8_quantize(emb: DataFrame) -> DataFrame:
    """(vec_id, vmin_micro, vmax_micro, codes array<int>) — affine int8
    codes over exact micro-units. Map-side only; scales linearly in rows
    and never shuffles."""
    return (
        emb.selectExpr("vec_id", f"{_VM_EXPR} AS vm")
        .selectExpr(
            "vec_id",
            "array_min(vm) AS vmin_micro",
            "array_max(vm) AS vmax_micro",
            "vm",
        )
        .selectExpr(
            "vec_id",
            "vmin_micro",
            "vmax_micro",
            "transform(vm, x -> CAST(coalesce((x - vmin_micro) * 255 div "
            "nullif(vmax_micro - vmin_micro, 0), 0) AS INT)) AS codes",
        )
    )


def int8_roundtrip_audit(emb: DataFrame) -> DataFrame:
    """1-row (n_vectors, max_abs_err_micro, passed): dequantize every
    code and verify the floor-division error bound holds for EVERY
    vector (bool_and), not just on average."""
    quant = (
        emb.selectExpr("vec_id", f"{_VM_EXPR} AS vm")
        .selectExpr(
            "vec_id",
            "vm",
            "array_min(vm) AS vmin_micro",
            "array_max(vm) - array_min(vm) AS rng",
        )
        .selectExpr(
            "vec_id",
            "rng",
            "transform(vm, x -> CAST(coalesce((x - vmin_micro) * 255 div "
            "nullif(rng, 0), 0) AS BIGINT)) AS codes",
            "vm",
            "vmin_micro",
        )
        .selectExpr(
            "vec_id",
            "rng",
            # per-vector max |vm - (vmin + (code*rng) div 255)|
            "array_max(zip_with(vm, codes, (v, c) -> "
            "abs(v - (vmin_micro + coalesce((c * rng) div 255, 0))))) AS err",
        )
    )
    return quant.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_vectors",
        "max(err) AS max_abs_err_micro",
        "bool_and(err <= rng div 255 + 1) AS passed",
    )


def q_emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Registry surface serializes the codes array to CSV: the driver's
    # pandas canonicalizer cannot sort/hash list cells (r06 red row), so
    # every registered top-level column must be scalar. Library callers
    # use int8_quantize() directly and keep the typed array.
    return int8_quantize(load_table(spark, sf_dir, "embeddings")).selectExpr(
        "vec_id",
        "vmin_micro",
        "vmax_micro",
        "array_join(transform(codes, c -> CAST(c AS STRING)), ',') AS codes_csv",
    )


SQL_EMB_INT8_QUANTIZE = """
WITH vm AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
    FROM embeddings
),
mm AS (
    SELECT vec_id, vm, list_min(vm) AS vmin_micro, list_max(vm) AS vmax_micro
    FROM vm
)
SELECT vec_id, vmin_micro, vmax_micro,
       array_to_string(list_transform(vm,
                x -> CAST(coalesce((x - vmin_micro) * 255
                                   // nullif(vmax_micro - vmin_micro, 0),
                                   0) AS INT)), ',') AS codes_csv
FROM mm
"""


def q_emb_int8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return int8_roundtrip_audit(load_table(spark, sf_dir, "embeddings"))


SQL_EMB_INT8_ROUNDTRIP = """
WITH vm AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
    FROM embeddings
),
mm AS (
    SELECT vec_id, vm, list_min(vm) AS vmin_micro,
           list_max(vm) - list_min(vm) AS rng
    FROM vm
),
coded AS (
    SELECT vec_id, rng, vm, vmin_micro,
           list_transform(vm, x -> CAST(coalesce((x - vmin_micro) * 255
                                                 // nullif(rng, 0), 0) AS BIGINT)) AS codes
    FROM mm
),
errs AS (
    SELECT vec_id, rng,
           list_max(list_transform(range(1, len(vm) + 1),
                    i -> abs(vm[i] - (vmin_micro + coalesce((codes[i] * rng) // 255, 0))))) AS err
    FROM coded
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       max(err) AS max_abs_err_micro,
       bool_and(err <= rng // 255 + 1) AS passed
FROM errs
"""


QUERIES = {
    "emb_int8_quantize": (q_emb_int8_quantize, SQL_EMB_INT8_QUANTIZE),
    "emb_int8_roundtrip": (q_emb_int8_roundtrip, SQL_EMB_INT8_ROUNDTRIP),
}
