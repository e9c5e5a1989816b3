package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling for pipeline QA (the north-star "know your corpus"
  * op): per-column null and distinct counts in ONE scan — every stat is a
  * column of a single aggregate row, then unpivoted with stack() into
  * (column, n_nulls, n_distinct) rows. No per-column jobs, no collect.
  *
  * At 100 TB: one pass + one tiny shuffle; count(DISTINCT) expands the
  * aggregate per column (Spark's expand operator) — for very wide tables
  * swap in approx_count_distinct via `exact = false`.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))).as(s"${c}__distinct"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackExpr = cols.map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    wide.select(col("__rows"),
        expr(s"stack(${cols.size}, $stackExpr) AS (col_name, n_nulls, n_distinct)"))
      .select(col("col_name"), col("__rows").as("n_rows"), col("n_nulls"), col("n_distinct"))
  }
}
