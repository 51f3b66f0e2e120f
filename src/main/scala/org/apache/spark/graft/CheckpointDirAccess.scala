package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Exact save/restore of `SparkContext.checkpointDir` for graft's
  * reliable-checkpoint plumbing ([[graft.operators.CkptChain]]).
  *
  * The public `setCheckpointDir(dir)` API cannot express a restore: it
  * always creates and switches to a fresh `dir/<UUID>` subdirectory, so
  * "restore the prior value" via the public call would nest one UUID
  * level per restore (unbounded path growth across an iterative
  * operator's rounds) — and there is no public unset at all. The
  * underlying state is a plain `private[spark] var checkpointDir:
  * Option[String]`, so this one-file shim in the `org.apache.spark`
  * namespace (same pattern as the repo's avro wire-codec bridge) reads
  * and writes it verbatim: `restore(sc, prior)` puts back EXACTLY what
  * `get(sc)` returned — including `None`, leaving zero residue when the
  * application had no checkpoint dir of its own. No Spark behavior is
  * modified; this touches only the variable the public setter already
  * assigns. */
object CheckpointDirAccess {
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
  def restore(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}
