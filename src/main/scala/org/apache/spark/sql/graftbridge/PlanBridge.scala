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
    * stores NO blocks — but it is NOT free at call time (ADVICE round
    * 10): under AQE, forcing `queryExecution.toRdd` blocks in
    * getFinalPhysicalPlan and SUBMITS the upstream exchange stages as
    * real Spark jobs right here, even if the caller never runs an
    * action on the result — those shuffle files then serve every
    * downstream action via stage skipping, and only the FINAL stage
    * stays lazy (recomputes per action). The LogicalRDD leaf also
    * carries no statistics, so downstream joins against it lose
    * size-estimate-driven broadcast decisions (AQE's runtime sizes
    * still apply). Call it when the frame WILL be consumed and its plan
    * size is the cost center. Semantics match the plain plan for
    * deterministic queries (recompute-per-action); do NOT use it to pin
    * nondeterministic results — that still needs a real checkpoint. */
  def lazyLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    spark.internalCreateDataFrame(qe.toRdd, df.schema)
  }
}
