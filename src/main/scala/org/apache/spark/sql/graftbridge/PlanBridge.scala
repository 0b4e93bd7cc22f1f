package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Bridge into `private[sql]` plan surgery (same pattern as
  * [[ColumnBridge]]). */
object PlanBridge {

  /** Re-root a DataFrame on its own lazily-computed RDD lineage: the
    * result's logical plan is a single LEAF (LogicalRDD), so every
    * DOWNSTREAM Dataset construction — analysis, CheckAnalysis's
    * full-tree walks, canonicalization for cache lookups — costs O(1)
    * in the input's plan size instead of O(size) per derived Dataset.
    *
    * Unlike `localCheckpoint` this runs NO row-materialization job and
    * stores NO blocks: `queryExecution.toRdd` plans the query once; with
    * AQE the upstream exchange stages materialize (as ordinary shuffle
    * files) the first time, the FINAL stage stays lazy and recomputes
    * per downstream action, and Spark's stage-skipping reuses the
    * shuffle files across those actions. Semantics therefore match the
    * plain plan for deterministic queries (recompute-per-action); do NOT
    * use it to pin nondeterministic results — that still needs a real
    * checkpoint. */
  def lazyLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    spark.internalCreateDataFrame(qe.toRdd, df.schema)
  }
}
