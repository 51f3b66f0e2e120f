package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage-flattening checkpoint plumbing for the iterative operator
  * families ([[Graph]]'s traversals, [[Dedup.dupClusters]]'s
  * min-label propagation, [[TextAnalysis.bpeMergeTable]]'s merge loop)
  * — extracted to its own object in round 13 and taught the full block
  * LIFECYCLE, not just the cut:
  *
  *   - '''Backends.''' `local` = `localCheckpoint` (DISK_ONLY by
  *     default, `spark.graft.graph.checkpointStorage=memdisk` opts back
  *     into MEMORY_AND_DISK — the round-12 A/B, see [[Graph]]);
  *     `reliable` = `Dataset.checkpoint()` into the context's
  *     checkpoint dir. Local checkpoints store blocks on executors with
  *     NO lineage fallback — one executor loss mid-iteration kills the
  *     job — so a long-running cluster deployment passes
  *     `checkpointDir` to the iterative operators and gets the reliable
  *     backend (write-per-round to durable storage, survives executor
  *     loss). The two backends are value-identical by construction
  *     (GraphSpec pins all three storage modes).
  *
  *   - '''Release.''' Before round 13 each iteration checkpointed a new
  *     relation and abandoned the previous one; blocks were only
  *     reclaimed when the RDD object happened to be GC'd (the bench's
  *     r12 artifact counted 184 leaked RDDs it swept up itself). Now
  *     [[CkptChain]] releases round N−1's storage as soon as round N is
  *     eagerly materialized — the loop holds O(1) checkpoints instead
  *     of O(rounds), which is the difference between bounded and
  *     unbounded storage on a multi-hour 100 TB iterative job.
  *     [[Ckpt.release]] frees both block-manager blocks (local) and
  *     checkpoint FILES (reliable — superseded rounds must not
  *     accumulate in durable storage either).
  *
  *   - '''The result-backing checkpoint.''' The final round's
  *     checkpoint necessarily backs the RETURNED DataFrame — an
  *     operator cannot release it without destroying its own result, so
  *     exactly one checkpoint per call (two for [[Graph.triangleCounts]],
  *     whose result reads both cuts) outlives the call, caller-owned.
  *     Callers that have fully consumed the result free it with
  *     [[Ckpt.release]]; harnesses that know ALL outstanding results
  *     are consumed (the bench, after each query's sink completes) use
  *     [[Ckpt.releaseIssued]], which frees every graft-issued
  *     checkpoint still persisted and leaves foreign blocks alone.
  */
object Ckpt {

  /** (applicationId, rddId) of checkpoint RDDs issued by graft
    * operators and not yet released. Ids only — holding the RDDs
    * themselves would extend their lifetime past the ContextCleaner's
    * weak-reference reclaim and turn the registry into its own leak.
    * Scoping by applicationId matters in a long-lived JVM: RDD ids
    * restart at 0 per SparkContext, so a bare-id registry carrying a
    * stale entry from a stopped context could match — and
    * [[releaseIssued]] would then unpersist — a FOREIGN cache in the
    * next context that happened to get the same id. Pruned against the
    * current context's live persistent set on every [[releaseIssued]]. */
  private val issued =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()
  private def key(rdd: RDD[_]): (String, Int) =
    (rdd.context.applicationId, rdd.id)

  /** Raise the one logger that warns per deliberate
    * unpersist-of-local-checkpoint to ERROR. The release path
    * unpersists locally-checkpointed RDDs ON PURPOSE — the successor
    * round is materialized before the predecessor's storage drops, so
    * nothing can ever recompute it — and Spark's per-RDD "lineage has
    * been truncated" warning is pure noise there (hundreds per bench
    * run) while staying accurate for an ACCIDENTAL unpersist elsewhere.
    * Explicit OPT-IN for harnesses (GraftSession/TestSpark call it);
    * deliberately NOT a class-load side effect, so an application that
    * merely links the library keeps its own warning trail. */
  def quietDeliberateUnpersistWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  /** The checkpoint-backing RDDs under a Dataset: `checkpoint()` /
    * `localCheckpoint()` return a Dataset whose analyzed plan is a
    * `LogicalRDD` leaf wrapping the materialized RDD; plans DERIVED
    * from checkpointed relations carry those leaves below projections
    * and joins, so a collect over the analyzed tree finds every
    * checkpoint a result still depends on. */
  private def backingRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  private def track(df: DataFrame): DataFrame = {
    backingRdds(df).foreach(r => issued.add(key(r)))
    df
  }

  /** Local (executor-block) checkpoint cut. DISK_ONLY blocks by default
    * — serialized through the OS page cache, flat RSS (the round-12 A/B
    * vs MEMORY_AND_DISK, numbers in PLANS.md; `memdisk` opts back in).
    * Fast and correct, but NOT durable: no lineage fallback, so an
    * executor loss mid-job is unrecoverable — iterative operators
    * expose `checkpointDir` to switch to [[reliable]] for cluster runs. */
  def local(df: DataFrame): DataFrame = track(
    if (df.sparkSession.conf
        .getOption("spark.graft.graph.checkpointStorage").contains("memdisk"))
      df.localCheckpoint()
    else df.localCheckpoint(true, StorageLevel.DISK_ONLY))

  /** Reliable checkpoint cut into the context's checkpoint dir (the
    * caller — normally [[CkptChain]] — has set it). Survives executor
    * loss at the cost of a durable write per cut.
    *
    * Known cost shape (probed round 13, tools/ProbeReliable): eager
    * `Dataset.checkpoint()` on an unpersisted plan runs the result
    * stage twice — once for the eager count, once for the
    * checkpoint-file write — but shuffle map stages are REUSED, so the
    * recompute is the final stage only. Staging through a local
    * checkpoint first (compute once → blocks, file-write reads blocks)
    * measured as a wash-to-slightly-worse at sf0.1 (plain 6.43 s vs
    * staged 6.74 on the c57 loop, identical checksums): the saved
    * final-stage recompute is repaid in block write+read. Kept plain
    * per the measured-win-only rule. */
  def reliable(df: DataFrame): DataFrame = track(df.checkpoint())

  /** Release the storage behind a checkpointed DataFrame — block-manager
    * blocks (local mode) and checkpoint files (reliable mode) of EVERY
    * checkpoint the plan depends on. The DataFrame (and any view built
    * on it) is unusable afterwards: local-checkpointed data has no
    * lineage to recompute from and reliable files are deleted. Call
    * only once the result is fully consumed. */
  def release(df: DataFrame): Unit = backingRdds(df).foreach { rdd =>
    issued.remove(key(rdd))
    rdd.unpersist(blocking = false)
    rdd.getCheckpointFile.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      try p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        .delete(p, true)
      catch { case _: java.io.IOException => () }
    }
  }

  /** Release every graft-issued checkpoint still persisted in `spark`'s
    * context and return how many were freed. For harnesses that know
    * all outstanding operator results are consumed (the bench calls
    * this after each query's sink completes) — a deterministic stand-in
    * for per-result [[release]] calls when the results themselves are
    * out of scope. Foreign persistent RDDs (caches the caller created)
    * are never touched. Reliable-mode checkpoints are not persistent
    * RDDs and so are NOT swept here; their files are caller-owned via
    * [[release]]. */
  def releaseIssued(spark: SparkSession): Int = {
    val app = spark.sparkContext.applicationId
    val persistent = spark.sparkContext.getPersistentRDDs
    var n = 0
    persistent.foreach { case (id, rdd) =>
      if (issued.remove((app, id))) { rdd.unpersist(blocking = false); n += 1 }
    }
    // this context's ids that are no longer persistent are gone for
    // good (their RDD objects are ContextCleaner property once
    // unreachable) — drop them so the registry stays bounded by the
    // number of LIVE checkpoints plus any stopped-context residue
    issued.removeIf(k => k._1 == app && !persistent.contains(k._2))
    n
  }

  /** Number of graft-issued checkpoints not yet released (diagnostic). */
  def issuedCount: Int = issued.size()
}

/** One operator call's chain of per-round checkpoints. `cut(slot)(df)`
  * checkpoints `df` eagerly (backend per `checkpointDir`) under a named
  * slot and RELEASES the slot's previous checkpoint — safe because the
  * successor is fully materialized before the predecessor's storage is
  * dropped, so nothing can ever need to re-read it. A loop that cuts
  * the same slot each round therefore holds O(1) checkpoints instead of
  * O(rounds). `close(keep*)` releases every still-held slot except the
  * ones backing the returned result (those are caller-owned — see
  * [[Ckpt]]'s lifecycle note).
  *
  * Backend resolution: the per-call `checkpointDir` argument wins; when
  * it is None, the session conf `spark.graft.checkpointDir` (if set)
  * supplies the reliable directory — so a cluster deployment turns the
  * WHOLE iterative family durable with one conf line, without editing
  * every call site (the packaged queries all call with defaults);
  * otherwise the local backend applies.
  *
  * Reliable mode routes through the context-global
  * `setCheckpointDir`; two reliable-mode operators running
  * CONCURRENTLY with different dirs would race on it (each cut lands
  * in whichever dir was set last — correct data, surprising
  * placement). Concurrent reliable calls should share one dir, which
  * the conf form gives naturally. */
private[graft] final class CkptChain(spark: SparkSession,
                                     checkpointDir: Option[String]) {
  private val dir: Option[String] =
    checkpointDir.orElse(spark.conf.getOption("spark.graft.checkpointDir"))
  // the context checkpoint dir is GLOBAL state; remember what the
  // application had set so close() can put it back — one operator call
  // must not silently redirect the app's own later df.checkpoint()
  // calls into this call's directory
  private val priorDir: Option[String] =
    if (dir.isDefined) spark.sparkContext.getCheckpointDir else None
  dir.foreach(spark.sparkContext.setCheckpointDir)
  private var held = Map.empty[String, DataFrame]

  def cut(slot: String)(df: DataFrame): DataFrame = {
    val cur = if (dir.isDefined) Ckpt.reliable(df) else Ckpt.local(df)
    held.get(slot).foreach(Ckpt.release)
    held += slot -> cur
    cur
  }

  /** Release every held checkpoint except the `keep` slots, and restore
    * the application's prior checkpoint dir. Call once on EVERY exit
    * path — right before returning the result, and with no `keep` from
    * a failure handler (a loop that throws mid-round must not strand
    * its held rounds; see the operators' try/catch). */
  def close(keep: String*): Unit = {
    val ks = keep.toSet
    held.foreach { case (slot, df) => if (!ks.contains(slot)) Ckpt.release(df) }
    held = held.filter { case (slot, _) => ks.contains(slot) }
    // restore only when we changed it AND the app had one (there is no
    // public unset; a None prior under our Some stays ours — documented
    // global-state residue, same as any setCheckpointDir caller)
    if (dir.isDefined) priorDir.foreach(spark.sparkContext.setCheckpointDir)
  }
}
