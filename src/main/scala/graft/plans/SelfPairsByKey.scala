package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Intra-bucket pair generation as a WHOLE-OPERATOR Catalyst extension
  * — the second custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * tier after [[TopKPerGroupNode]], for the one blocking-join shape
  * every banded similarity pipeline shares (MinHash LSH, SimHash,
  * perceptual-hash hamming, SRP buckets): all unordered id pairs that
  * co-occur under a bucket key.
  *
  * The composition idiom is a self-equi-join on the bucket key:
  * `a ⋈ b ON key, id_a < id_b`. Measured at the 50k-doc 10× probe
  * tier (round 9, PLANS.md), that shape pays three avoidable costs:
  *
  *   - BOTH join sides shuffle (or one broadcasts) the banded
  *     relation — and under AQE the broadcast variant DEFEATS exchange
  *     reuse, re-running the upstream signature aggregation per side
  *     (observed: two `partial_min(xxhash64…)` subtrees in the c2
  *     executed plan);
  *   - the join materializes the full m×m bucket cross product and
  *     FILTERS half away after the fact;
  *   - the hash join builds a per-partition hash table of one whole
  *     side just to rediscover bucket co-membership.
  *
  * This operator instead requires `ClusteredDistribution(key)` — so
  * `EnsureRequirements` inserts exactly ONE exchange of the skinny
  * (key, id) relation — then, per partition, groups rows by bucket and
  * emits each bucket's C(m,2) ordered pairs directly. Measured 2.4×
  * on the candidate stage (4.0 s → 1.7 s at 50k docs), and the
  * single-consumption shape makes the one-signature-pass structural
  * instead of optimizer-dependent.
  *
  * Known bound, stated honestly: a bucket of size m emits C(m,2) pairs
  * in ANY formulation — that quadratic lives in the problem, not the
  * operator (LSH banding exists precisely to keep buckets small). The
  * `maxBucket` knob drops buckets larger than the bound before
  * pairing (0 = unbounded): at corpus scale a viral duplicate's
  * mega-bucket is better handled by the exact-dedup tier first, the
  * same stopword-prune trade as `Graph.coOccurrencePairs`'
  * `maxItemDeg`. Per-partition state is the partition's (key, id)
  * pairs — the same order of memory a shuffled hash join's build side
  * holds, without the composition's AQE skew-split escape hatch; cap
  * accordingly when bucket skew is expected. Null ids never pair (the
  * equi-join drops them too — null keys don't match themselves).
  *
  * Output columns are `id_a`, `id_b` (id_a < id_b STRICT under the id
  * type's natural ordering — an id repeated within a bucket never
  * self-pairs, and within-bucket multiplicity collapses), duplicated
  * across buckets exactly like the composition — callers `.distinct()`
  * for cross-bucket dedup. `maxBucket` bounds the RAW bucket row
  * count (pre-collapse).
  */
case class SelfPairsByKeyNode(keyExprs: Seq[Expression], idExpr: Expression,
                              payloadExpr: Option[Expression], maxBucket: Int,
                              child: LogicalPlan, outAttrs: Seq[Attribute])
    extends UnaryNode {
  override def output: Seq[Attribute] = outAttrs
  // output attributes are minted here, not inherited — without this the
  // analyzer reports them missing from the child's input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): SelfPairsByKeyNode =
    copy(child = newChild)
}

/** Plans [[SelfPairsByKeyNode]] as the single-exchange bucket-pair exec. */
object SelfPairsByKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SelfPairsByKeyNode(k, id, pl, cap, child, out) =>
      SelfPairsByKeyExec(k, id, pl, cap, planLater(child), out) :: Nil
    case _ => Nil
  }
}

case class SelfPairsByKeyExec(keyExprs: Seq[Expression], idExpr: Expression,
                              payloadExpr: Option[Expression], maxBucket: Int,
                              child: SparkPlan, outAttrs: Seq[Attribute])
    extends UnaryExecNode {
  override def output: Seq[Attribute] = outAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)
  // the one exchange: co-locate each bucket's rows on one task
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyE = keyExprs
    val idE = idExpr
    val plE = payloadExpr
    val cap = maxBucket
    val dt = idExpr.dataType
    val pdt = payloadExpr.map(_.dataType)
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyE, childOutput)
      val idBound = BindReferences.bindReference(idE, childOutput)
      val plBound = plE.map(e => BindReferences.bindReference(e, childOutput))
      val hasPayload = plBound.isDefined
      // parallel (id, payload) buffers per bucket; payload slot absent
      // in the 2-column form
      val buckets = new java.util.HashMap[
        org.apache.spark.sql.catalyst.expressions.UnsafeRow,
        scala.collection.mutable.ArrayBuffer[AnyRef]]()
      while (iter.hasNext) {
        val row = iter.next()
        val id = idBound.eval(row)
        if (id != null) {
          val key = keyProj(row)
          var ids = buckets.get(key)
          if (ids == null) {
            ids = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
            buckets.put(key.copy(), ids)
          }
          ids += id.asInstanceOf[AnyRef]
          if (hasPayload) {
            // payloads can be mutable internal values (UTF8String,
            // arrays backed by the row buffer) — copy via InternalRow
            val p = plBound.get.eval(row)
            ids += (p match {
              case u: org.apache.spark.sql.catalyst.util.ArrayData => u.copy()
              case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
              case other => other.asInstanceOf[AnyRef]
            })
          }
        }
      }
      val ord = TypeUtils.getInterpretedOrdering(dt)
      val stride = if (hasPayload) 2 else 1
      val nOut = if (hasPayload) 4 else 2
      val toUnsafe = UnsafeProjection.create(
        (Seq(dt, dt) ++ pdt.toSeq.flatMap(p => Seq(p, p))).toArray)
      val pairRow = new GenericInternalRow(nOut)
      import scala.jdk.CollectionConverters._
      buckets.values().iterator().asScala
        .filter(b => b.length > stride && (cap <= 0 || b.length / stride <= cap))
        .flatMap { buf =>
          val m = buf.length / stride
          val idx = Array.range(0, m)
          val cmp = new java.util.Comparator[Int] {
            override def compare(x: Int, y: Int): Int =
              ord.asInstanceOf[Ordering[AnyRef]]
                .compare(buf(x * stride), buf(y * stride))
          }
          val boxed = idx.map(Integer.valueOf)
          java.util.Arrays.sort(boxed, cmp.asInstanceOf[java.util.Comparator[Integer]])
          // collapse equal id values: an id repeated within a bucket
          // must not self-pair (id_a < id_b is strict); the payload is
          // functionally determined by the id in every caller, so the
          // first occurrence's payload stands
          val kept = new scala.collection.mutable.ArrayBuffer[Int](m)
          var p = 0
          while (p < m) {
            val i = boxed(p).intValue()
            if (kept.isEmpty ||
              ord.asInstanceOf[Ordering[AnyRef]]
                .compare(buf(kept.last * stride), buf(i * stride)) != 0)
              kept += i
            p += 1
          }
          kept.indices.iterator.flatMap { i =>
            (i + 1 until kept.length).iterator.map { j =>
              val (bi, bj) = (kept(i) * stride, kept(j) * stride)
              pairRow.update(0, buf(bi)); pairRow.update(1, buf(bj))
              if (hasPayload) {
                pairRow.update(2, buf(bi + 1)); pairRow.update(3, buf(bj + 1))
              }
              toUnsafe(pairRow)
            }
          }
        }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SelfPairsByKeyExec =
    copy(child = newChild)
}

object SelfPairsByKey {
  /** All unordered id pairs co-occurring under `keyCols`, as
    * (id_a, id_b) with id_a < id_b; pairs recur across buckets exactly
    * like the self-join idiom (callers `.distinct()`). `maxBucket > 0`
    * drops buckets larger than the bound before pairing. Registers the
    * strategy on the session (idempotent; the
    * `spark.sql.extensions=graft.GraftExtensions` route registers it
    * at session build instead). */
  def selfPairsByKey(df: DataFrame, keyCols: Seq[String], idCol: String,
                     maxBucket: Int = 0): DataFrame =
    build(df, keyCols, idCol, None, maxBucket)

  /** Payload form: (id_a, id_b, <pa>, <pb>) where pa/pb are
    * `payloadCol`'s value for each pair side (the signature-carrying
    * variant SimHash/hamming verify tiers need — saves re-joining a
    * corpus-sized signature relation onto the pair set). The payload
    * must be functionally determined by the id (true for every
    * signature pipeline: one signature per doc). */
  def selfPairsByKeyWithPayload(df: DataFrame, keyCols: Seq[String],
                                idCol: String, payloadCol: String,
                                outNames: (String, String),
                                maxBucket: Int = 0): DataFrame =
    build(df, keyCols, idCol, Some((payloadCol, outNames)), maxBucket)

  private def build(df: DataFrame, keyCols: Seq[String], idCol: String,
                    payload: Option[(String, (String, String))],
                    maxBucket: Int): DataFrame = {
    require(keyCols.nonEmpty, "selfPairsByKey needs at least one key column")
    val spark = df.sparkSession
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(SelfPairsByKeyStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ SelfPairsByKeyStrategy
    }
    val lp = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = lp.output.filter(a => resolver(a.name, n)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"no column '$n' in ${lp.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"ambiguous column '$n': ${many.size} attributes match " +
          s"(${many.map(_.qualifiedName).mkString(", ")}) — disambiguate upstream")
    }
    val id = attr(idCol)
    require(TypeUtils.checkForOrderingExpr(id.dataType, "selfPairsByKey")
      .isSuccess, s"id column '$idCol' type ${id.dataType} is not orderable")
    val outA = AttributeReference("id_a", id.dataType, nullable = false)()
    val outB = AttributeReference("id_b", id.dataType, nullable = false)()
    val pl = payload.map { case (pc, _) => attr(pc) }
    val plOut = payload.toSeq.flatMap { case (pc, (na, nb)) =>
      val a = attr(pc)
      Seq(AttributeReference(na, a.dataType, a.nullable)(),
        AttributeReference(nb, a.dataType, a.nullable)())
    }
    GraftColumnBridge.ofRows(spark,
      SelfPairsByKeyNode(keyCols.map(attr), id, pl, maxBucket, lp,
        Seq(outA, outB) ++ plOut))
  }
}
