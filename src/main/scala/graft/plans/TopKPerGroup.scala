package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shims

/** Per-group top-k as a first-class operator.
  *
  * The built-in formulation (`row_number().over(window) <= k`) SORTS every
  * group in full — at 100 TB that is a total sort of the fact table just to
  * keep k rows per key. This operator keeps a bounded k-element heap per
  * key per partition instead: O(n log k) time, O(#keys × k) memory, and the
  * only exchange is the hash partition by group key (no sort at all).
  *
  * Semantics: rows ranked by `order` DESC, ties broken by `tie` ASC with
  * NULL ties FIRST (callers pass a unique tie column for determinism —
  * same contract as a deterministic window's `asc_nulls_first`, and the
  * reason no caller needs a null SENTINEL: a sentinel either collides
  * with a genuine id — the ADVICE-r13 bug — or costs a per-row encoding;
  * the exec ordering nulls natively does neither). Rows with a null/NaN
  * `order` are dropped. Integral orders rank at full 64-bit precision
  * (values past 2^53 are NOT coerced through Double); fractional orders
  * use an order-preserving bit mapping. Ties are integral (exact 64-bit
  * compare) or string (raw UTF-8 byte order — Spark's binary collation).
  *
  * Wiring: logical node [[TopKPerGroupPlan]] → [[TopKStrategy]] →
  * [[TopKPerGroupExec]]; `TopKPerGroup.perKey` is the Column-API entry and
  * self-registers the strategy on the session (also injectable via
  * `graft.functions.GraftExtensions`).
  */
case class TopKPerGroupPlan(
    grouping: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, t, k, child) =>
      TopKPerGroupExec(g, o, t, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    grouping: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(grouping) :: Nil

  // the exec filters rows WITHIN partitions — it never moves one — so
  // the child's partitioning survives verbatim. Without this override
  // the default UnknownPartitioning makes EnsureRequirements insert a
  // redundant exchange above every cut whose consumer re-clusters on
  // the same key (a per-key rank window, a per-key aggregate, a second
  // cut — the rankingEval/mrlRerank shapes), re-shuffling rows that
  // are already exactly where they need to be.
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "output rows"),
    "numDroppedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows dropped by per-group k-cap"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupingExprs = grouping
    val orderExpr = order
    val tieExpr = tie
    val kk = k
    val outputRows = longMetric("numOutputRows")
    val droppedRows = longMetric("numDroppedRows")
    // integral orders compare as raw longs — full 64-bit precision (a
    // Double coercion would collapse longs past 2^53 and mis-rank ties);
    // fractional orders map through the order-preserving bit trick below
    val integralOrder = orderExpr.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // string ties break on raw UTF-8 byte order (UTF8String.compareTo) —
    // the same binary collation Spark's own string sort uses
    val stringTie = tieExpr.dataType ==
      org.apache.spark.sql.types.StringType
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val boundOrder = BindReferences.bindReference(orderExpr, childOutput)
      val boundTie = BindReferences.bindReference(tieExpr, childOutput)
      // monotone double→long: IEEE bits already order positives under
      // signed compare; negatives order backwards, so flip their non-sign
      // bits — then signed-long order == double order (-0.0 normalized)
      def sortableBits(d: Double): Long = {
        val b = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
        b ^ ((b >> 63) & java.lang.Long.MAX_VALUE)
      }
      // tie values are stored pre-converted: boxed Long for integral ties
      // (exact 64-bit compare), cloned UTF8String for string ties (eval
      // returns a view into the reused row buffer — it must be copied
      // before outliving the iterator step). A null tie orders FIRST
      // (asc nulls-first, the window parity) — handled HERE so nullable
      // id columns ride the native long/string path instead of paying a
      // per-row sentinel encoding at the mapping layer
      def nullsFirst(cmp: (Any, Any) => Int): (Any, Any) => Int =
        (a, b) =>
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else cmp(a, b)
      val tieCmp: (Any, Any) => Int =
        if (stringTie)
          nullsFirst((a, b) =>
            a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
              .compareTo(
                b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
        else
          nullsFirst((a, b) => java.lang.Long.compare(
            a.asInstanceOf[java.lang.Long], b.asInstanceOf[java.lang.Long]))
      // min-heap ordered by "badness": head is the weakest kept row
      // (lowest order value; among equals, the HIGHEST tie value)
      implicit val badness: Ordering[(Long, Any, UnsafeRow)] =
        Ordering.fromLessThan { (a, b) =>
          if (a._1 != b._1) a._1 < b._1 else tieCmp(a._2, b._2) > 0
        }
      val heaps = mutable.LinkedHashMap.empty[
        UnsafeRow, mutable.PriorityQueue[(Long, Any, UnsafeRow)]]
      iter.foreach { row =>
        val ov = boundOrder.eval(row)
        val tv = boundTie.eval(row)
        // NaN order values are dropped along with null orders: NaN
        // comparisons are false both ways, which would make heap
        // contents depend on row arrival order (nondeterministic across
        // shuffles). Null TIE values are kept and rank first — see
        // tieCmp above.
        if (ov != null &&
          (integralOrder ||
            !java.lang.Double.isNaN(ov.asInstanceOf[Number].doubleValue()))) {
          val v =
            if (integralOrder) ov.asInstanceOf[Number].longValue()
            else sortableBits(ov.asInstanceOf[Number].doubleValue())
          val t: Any =
            if (tv == null) null
            else if (stringTie)
              tv.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone()
            else java.lang.Long.valueOf(tv.asInstanceOf[Number].longValue())
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue
                .empty[(Long, Any, UnsafeRow)](badness.reverse)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kk) {
            heap.enqueue((v, t, row.asInstanceOf[UnsafeRow].copy()))
          } else {
            val worst = heap.head
            if (badness.gt((v, t, null), worst)) {
              heap.dequeue()
              heap.enqueue((v, t, row.asInstanceOf[UnsafeRow].copy()))
              droppedRows += 1
            } else {
              droppedRows += 1
            }
          }
        }
      }
      heaps.valuesIterator.flatMap { h =>
        // dequeue yields weakest-first; fill backwards → strongest-first
        val elems = new Array[InternalRow](h.size)
        var i = h.size - 1
        while (h.nonEmpty) { elems(i) = h.dequeue()._3; i -= 1 }
        outputRows += elems.length
        elems.iterator
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroup {
  /** Top `k` rows per group, ranked by `orderCol` DESC with ties broken by
    * `tieCol` ASC. Columns are direct column names of `df` (project
    * derived expressions into columns first); they are resolved here
    * against the analyzed child, so the custom node enters the planner
    * fully resolved. Registers [[TopKStrategy]] on the session if needed. */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val child = Shims.logicalPlan(df)
    def attr(n: String): Attribute =
      child.output.filter(_.name.equalsIgnoreCase(n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${child.output.map(_.name).mkString(", ")}")
        case many =>
          // match Spark's own case-insensitive resolver: two columns
          // differing only in case is AMBIGUOUS, not first-wins
          throw new IllegalArgumentException(
            s"column $n is ambiguous — matches " +
              many.map(_.name).mkString(", "))
      }
    val orderAttr = attr(orderCol)
    val tieAttr = attr(tieCol)
    orderAttr.dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"order column $orderCol must be numeric, got ${other.sql}")
    }
    tieAttr.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.StringType => ()
      case other => throw new IllegalArgumentException(
        s"tie column $tieCol must be an integral type (its 64-bit value " +
          s"breaks ties exactly) or a string (raw UTF-8 byte order), " +
          s"got ${other.sql}")
    }
    val plan = TopKPerGroupPlan(
      keys.map(attr), orderAttr, tieAttr, k, child)
    Shims.ofRows(spark, plan)
  }

  /** Types the exec ranks at NATIVE precision — integral orders as raw
    * 64-bit longs, float/double through the order-preserving bit
    * mapping. Callers with one of these order types must NOT pre-coerce
    * through `cast("double")` (that collapses longs past 2⁵³ — the
    * exact loss the exec's integral path exists to avoid); anything
    * else (decimal, etc.) needs a caller-side cast to a native type
    * first. One predicate so callers can't drift from the exec's
    * `integralOrder` dispatch. */
  def ranksNatively(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }

  /** ASC-order-preserving tie column for [[perKey]] over an arbitrary
    * orderable id column — the internal mapping that lets the
    * keep-one/argmax operators accept the same id types their old
    * window formulations did, instead of rejecting everything outside
    * the exec's native integral-or-string contract. Every arm is a PURE
    * exact conversion: nulls propagate and the EXEC orders them first
    * (tieCmp's nulls-first — the window's asc_nulls_first), so there is
    * no sentinel to collide with a genuine id (the ADVICE-r13 bug), and
    * no per-row encoding on the hot path (the round-14 review finding:
    * the interim fix hex-encoded every nullable long id — an allocation
    * + string compare per corpus row to handle a measure-zero case the
    * comparator handles for free):
    *
    *  - byte/short/int/boolean → long (exact widening)
    *  - long / string → itself (nullable or not)
    *  - decimal p ≤ 18 → exact unscaled long (same-scale columns order
    *    identically; no double collapse past 2⁵³)
    *  - date / timestamp / timestamp_ntz → exact epoch days/micros
    *
    * Returns None for types with no exact order-preserving mapping
    * (wide decimals, floats, complex types) — callers fall back or
    * fail with their own contract error. */
  def tieExpr(df: DataFrame, idCol: String): Option[Column] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val c = col(idCol)
    val field = df.schema(idCol)
    field.dataType match {
      case ByteType | ShortType | IntegerType | BooleanType =>
        Some(c.cast("long"))
      case LongType => Some(c)
      case StringType => Some(c)
      case d: DecimalType if d.precision <= 18 =>
        Some(Shims.column(org.apache.spark.sql.catalyst.expressions
          .UnscaledValue(Shims.expression(c))))
      case DateType =>
        Some(unix_date(c).cast("long"))
      case TimestampType =>
        Some(unix_micros(c))
      case TimestampNTZType =>
        // The NTZ→timestamp cast must carry an EXPLICIT fixed-offset
        // zone: under the session zone, a DST spring-forward gap maps
        // distinct wall times to one instant (non-injective — distinct
        // ids would tie and the survivor become arrival-order-dependent)
        // and the same call would keep different winners under different
        // session zones. UTC has no transitions, so the mapping is an
        // exact bijection onto epoch micros.
        Some(Shims.column(org.apache.spark.sql.catalyst.expressions.UnixMicros(
          org.apache.spark.sql.catalyst.expressions.Cast(
            Shims.expression(c), org.apache.spark.sql.types.TimestampType,
            Some("UTC")))))
      case _ => None
    }
  }

  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
}
