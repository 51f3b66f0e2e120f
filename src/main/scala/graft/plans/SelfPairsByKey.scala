package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
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
  * `maxItemDeg`. Memory is BOUNDED: the exec additionally requires
  * in-partition ordering on the bucket key, so `EnsureRequirements`
  * plans a (spillable, UnsafeExternalSorter-backed) sort after the
  * exchange and buckets arrive contiguously — the exec buffers only
  * the CURRENT bucket, never the partition, and with `maxBucket > 0`
  * an over-cap bucket's buffer is discarded the moment it crosses the
  * bound (the rest of the mega-bucket streams through without being
  * stored). Heap high-water is therefore O(maxBucket) when capped and
  * O(largest bucket) when not — the quadratic-output tier's inherent
  * floor, not the partition size. Null ids never pair (the equi-join
  * drops them too — null keys don't match themselves). Group
  * boundaries follow the sort's LOGICAL key equality (the same
  * equivalence the self-join idiom uses), so e.g. float keys 0.0 and
  * -0.0 share a bucket — every caller keys on int/long/string hashes
  * where logical and binary equality coincide.
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
  // ... plus an in-partition sort on the key, so buckets arrive
  // contiguously and the exec never buffers more than ONE bucket.
  // The sort is Spark's own UnsafeExternalSorter — it spills, which is
  // exactly the memory-safety the old whole-partition HashMap lacked.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keyExprs.map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyE = keyExprs
    val idE = idExpr
    val plE = payloadExpr
    val cap = maxBucket
    val dt = idExpr.dataType
    val pdt = payloadExpr.map(_.dataType)
    val keyTypes = keyExprs.map(_.dataType)
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyE, childOutput)
      val idBound = BindReferences.bindReference(idE, childOutput)
      val plBound = plE.map(e => BindReferences.bindReference(e, childOutput))
      val hasPayload = plBound.isDefined
      val stride = if (hasPayload) 2 else 1
      val nOut = if (hasPayload) 4 else 2
      val ord = TypeUtils.getInterpretedOrdering(dt)
      // logical key equality = the sort's equivalence, so contiguity
      // is guaranteed by the required ordering
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val toUnsafe = UnsafeProjection.create(
        (Seq(dt, dt) ++ pdt.toSeq.flatMap(p => Seq(p, p))).toArray)
      val pairRow = new GenericInternalRow(nOut)

      def copyVal(v: Any): AnyRef = v match {
        // ids/payloads can be mutable internal values backed by the
        // (reused) row buffer — copy before buffering across rows
        case u: org.apache.spark.sql.catalyst.util.ArrayData => u.copy()
        case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
        case other => other.asInstanceOf[AnyRef]
      }

      // emit each qualifying bucket's C(m,2) ordered pairs; `arr` is
      // the flushed single-bucket buffer (id [, payload] stride)
      def emitPairs(arr: Array[AnyRef]): Iterator[InternalRow] = {
        val m = arr.length / stride
        val boxed = Array.range(0, m).map(Integer.valueOf)
        val cmp = new java.util.Comparator[Integer] {
          override def compare(x: Integer, y: Integer): Int =
            ord.asInstanceOf[Ordering[AnyRef]]
              .compare(arr(x.intValue() * stride), arr(y.intValue() * stride))
        }
        java.util.Arrays.sort(boxed, cmp)
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
              .compare(arr(kept.last * stride), arr(i * stride)) != 0)
            kept += i
          p += 1
        }
        kept.indices.iterator.flatMap { i =>
          (i + 1 until kept.length).iterator.map { j =>
            val (bi, bj) = (kept(i) * stride, kept(j) * stride)
            pairRow.update(0, arr(bi)); pairRow.update(1, arr(bj))
            if (hasPayload) {
              pairRow.update(2, arr(bi + 1)); pairRow.update(3, arr(bj + 1))
            }
            toUnsafe(pairRow)
          }
        }
      }

      // streaming-group state: ONE bucket's values, its raw (non-null
      // id) row count, and whether it already crossed the cap
      new Iterator[InternalRow] {
        private val buf = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
        private var rawRows = 0
        private var overflow = false
        private var curKey: UnsafeRow = null
        private var out: Iterator[InternalRow] = Iterator.empty

        private def consume(row: InternalRow): Unit = {
          val id = idBound.eval(row)
          if (id != null) {
            rawRows += 1
            if (cap > 0 && rawRows > cap) {
              // mega-bucket: stop storing it — the rest streams through
              if (!overflow) { overflow = true; buf.clear() }
            } else {
              buf += copyVal(id)
              if (hasPayload) buf += copyVal(plBound.get.eval(row))
            }
          }
        }

        private def flush(): Iterator[InternalRow] = {
          val qualifies = !overflow && buf.length > stride
          val pairs =
            if (qualifies) { val arr = buf.toArray; emitPairs(arr) }
            else Iterator.empty
          buf.clear(); rawRows = 0; overflow = false
          pairs
        }

        override def hasNext: Boolean = {
          while (!out.hasNext) {
            if (!iter.hasNext) {
              if (curKey == null) return false
              curKey = null
              out = flush()
              if (!out.hasNext) return false
            } else {
              val row = iter.next()
              val key = keyProj(row)
              if (curKey != null && keyOrd.compare(key, curKey) != 0) {
                val done = flush() // flush snapshots before consume mutates
                curKey = key.copy()
                consume(row)
                out = done
              } else {
                if (curKey == null) curKey = key.copy()
                consume(row)
              }
            }
          }
          true
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          out.next()
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
    keyCols.foreach { k =>
      // the exec's required child ordering sorts on the keys, so they
      // must be orderable (every caller keys on int/long/string hashes)
      require(TypeUtils.checkForOrderingExpr(attr(k).dataType, "selfPairsByKey")
        .isSuccess, s"key column '$k' type ${attr(k).dataType} is not orderable")
    }
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
