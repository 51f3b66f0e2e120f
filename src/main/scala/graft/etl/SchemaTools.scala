package graft.etl

import org.apache.spark.sql.DataFrame

/** Schema normalization with the reference's semantics
  * (`ClassMapMapper.kt:14-42`):
  *  - column names are uppercased (label-preferred normalization,
  *    `ClassMapMapper.kt:19-21`) — in Spark the "label" is already the
  *    projected alias, so uppercasing the output schema is the whole rule;
  *  - duplicate names after normalization are a hard error
  *    (`ClassMapMapper.kt:22-24`), raised eagerly rather than at bind
  *    time.
  *
  * The reference's per-column JVM-class cache (`nameClassMap`) is
  * subsumed by `df.schema` — a real schema object carried by the plan.
  */
object SchemaTools {

  def normalizeUppercase(df: DataFrame): DataFrame = {
    val upper = df.columns.map(_.toUpperCase)
    val dups = upper.groupBy(identity).collect { case (n, vs) if vs.length > 1 => n }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"column ${dups.head} appeared twice in this resultset!")
    df.toDF(upper.toIndexedSeq: _*)
  }

  /** Projection onto the target's columns — the explicit replacement for
    * the reference's `setUnusedBindingAllowed(true)` (extra extracted
    * columns silently dropped at bind time, `DatabaseBean.kt:42-48`).
    * Case-insensitive resolution, preserving target order. */
  def projectToTarget(df: DataFrame, targetColumns: Seq[String]): DataFrame = {
    if (targetColumns.isEmpty) df
    else {
      val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
      val missing = targetColumns.filterNot(c => byLower.contains(c.toLowerCase))
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"target columns not in extract result: ${missing.mkString(", ")}")
      df.select(targetColumns.map(c => df.col(byLower(c.toLowerCase))): _*)
    }
  }
}
