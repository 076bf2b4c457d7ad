package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration of the as-of join (the
  * preference-(c) path from the build brief: custom LogicalPlan +
  * SparkStrategy + SparkPlan, for semantics Spark's built-in operators
  * don't express as a single relational node).
  *
  * Semantics (identical to [[graft.ops.AsOfJoin.apply]], which stays as
  * the composed-from-built-ins formulation): for every left row, attach
  * the payload of the most recent right row with
  * `rightTime <= leftTime` within the same key group; among right rows
  * tied on (keys, time) the greatest payload wins; unmatched left rows
  * get nulls.
  *
  * Physical algorithm: co-partition both sides on the keys
  * ([[ClusteredDistribution]] → one shuffle each, satisfied for free by
  * an already-partitioned child), sort each side by (keys, time)
  * within partitions, then a single O(nL + nR) streaming merge per
  * partition. Versus the union+window formulation this never widens
  * rows with null padding, sorts each side separately (two smaller
  * sorts instead of one combined), and carries no window-function
  * machinery — and unlike a `l.time >= r.time` theta join it cannot
  * degenerate to a broadcast-nested-loop row explosion at 100 TB.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    toleranceUs: Option[Long] = None,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut is minted by this node, not read from the children —
  // without this, checkAnalysis reports it as missing input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

final class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.payload, n.payloadOut, n.toleranceUs, n.forward,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    toleranceUs: Option[Long],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  // the merge compares the two time columns with one ordering — they
  // must be the same type, tolerance or not
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must share a type, got ${leftTime.dataType} " +
      s"vs ${rightTime.dataType}")
  // same for every key pair: there is no coercion in this operator, and
  // the fixed-width merge picks width codes from the LEFT types — a
  // mismatched right key would be read with the wrong accessor
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of key columns must share types pairwise, got " +
      s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  // tolerance compares time values as raw long MICROSECONDS — sound
  // exactly for the timestamp types whose internal representation is
  // micros (a bare LongType column has arbitrary units; pre-convert to
  // a timestamp to use tolerance)
  toleranceUs.foreach { t =>
    require(t >= 0, s"as-of tolerance must be >= 0, got $t")
    require(leftTime.dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }, s"as-of tolerance requires a timestamp time column, " +
      s"got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  // one hash shuffle per side (elided when a child is already
  // partitioned compatibly); EnsureRequirements co-partitions the pair
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // right additionally sorted by payload so the merge's "last row wins"
  // deterministically picks the greatest payload among (keys, time) ties
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: payload)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Fixed-width integral representation? These types read as a raw
    * long/int from the row, so the merge can compare ordinals directly —
    * no per-row UnsafeProjection, no interpreted RowOrdering. Keys and
    * times are nearly always ids/timestamps, so this IS the hot path.
    */
  private def fixedWidth(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType |
           DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  override protected def doExecute(): RDD[InternalRow] =
    if ((leftKeys.map(_.dataType) :+ leftTime.dataType).forall(fixedWidth))
      doExecuteFixedWidth()
    else doExecuteGeneric()

  /** Specialized merge for integral keys/time: per-left-row work is a
    * handful of primitive reads and compares. Measured ~3x over the
    * generic path at sf0.1 (the per-row UnsafeProjection + interpreted
    * ordering pair costs ~1.5µs/row).
    */
  private def doExecuteFixedWidth(): RDD[InternalRow] = {
    import org.apache.spark.sql.types._
    def widthCode(dt: DataType): Byte = dt match {
      case LongType | TimestampType | TimestampNTZType => 0
      case IntegerType | DateType => 1
      case ShortType => 2
      case _ => 3 // ByteType
    }
    def ordinal(a: Attribute, out: Seq[Attribute]): Int = {
      val i = out.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"as-of: attribute $a missing from child output $out")
      i
    }
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = leftKeys.map(ordinal(_, lOut)).toArray
    val rKeyIdx = rightKeys.map(ordinal(_, rOut)).toArray
    val keyCode = leftKeys.map(k => widthCode(k.dataType)).toArray
    val lTimeIdx = ordinal(leftTime, lOut)
    val rTimeIdx = ordinal(rightTime, rOut)
    val timeCode = widthCode(leftTime.dataType)
    val payloadExprs = payload
    val outExprs = output
    val payloadOutLocal = payloadOut
    val tol = toleranceUs.getOrElse(-1L)
    val fwd = forward

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val outProj = UnsafeProjection.create(outExprs, lOut ++ payloadOutLocal)
      val nullPayload = new GenericInternalRow(payloadExprs.length)
      val joined = new JoinedRow
      val nKeys = lKeyIdx.length

      def read(row: InternalRow, idx: Int, code: Byte): Long = code match {
        case 0 => row.getLong(idx)
        case 1 => row.getInt(idx).toLong
        case 2 => row.getShort(idx).toLong
        case _ => row.getByte(idx).toLong
      }
      // ascending NULLS FIRST, matching the required SortOrder
      def cmpNullable(rNull: Boolean, rVal: Long, lNull: Boolean, lVal: Long): Int =
        if (rNull && lNull) 0 else if (rNull) -1 else if (lNull) 1
        else java.lang.Long.compare(rVal, lVal)
      // right row's keys vs left row's keys
      def cmpKeysRL(r: InternalRow, l: InternalRow): Int = {
        var i = 0
        while (i < nKeys) {
          val rn = r.isNullAt(rKeyIdx(i)); val ln = l.isNullAt(lKeyIdx(i))
          val c = cmpNullable(rn, if (rn) 0L else read(r, rKeyIdx(i), keyCode(i)),
            ln, if (ln) 0L else read(l, lKeyIdx(i), keyCode(i)))
          if (c != 0) return c
          i += 1
        }
        0
      }
      def cmpTimeRL(r: InternalRow, l: InternalRow): Int = {
        val rn = r.isNullAt(rTimeIdx); val ln = l.isNullAt(lTimeIdx)
        cmpNullable(rn, if (rn) 0L else read(r, rTimeIdx, timeCode),
          ln, if (ln) 0L else read(l, lTimeIdx, timeCode))
      }

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        // held right-row state (backward direction): key values snapshot
        // into primitive arrays — no row copies on the per-row path
        private val heldKeyVal = new Array[Long](nKeys)
        private val heldKeyNull = new Array[Boolean](nKeys)
        private var heldValid = false
        private var heldPayload: UnsafeRow = _
        private var heldTimeUs: Long = Long.MinValue
        private var heldTimeNull: Boolean = true

        private def advanceRight(): Unit =
          rRow = if (rIter.hasNext) rIter.next() else null

        advanceRight()

        private def holdRight(): Unit = {
          var i = 0
          while (i < nKeys) {
            heldKeyNull(i) = rRow.isNullAt(rKeyIdx(i))
            heldKeyVal(i) = if (heldKeyNull(i)) 0L else read(rRow, rKeyIdx(i), keyCode(i))
            i += 1
          }
          heldPayload = payloadProj(rRow).copy()
          heldTimeNull = rRow.isNullAt(rTimeIdx)
          heldTimeUs = if (heldTimeNull) Long.MinValue else read(rRow, rTimeIdx, timeCode)
          heldValid = true
        }

        private def heldMatches(l: InternalRow): Boolean = {
          var i = 0
          while (i < nKeys) {
            val ln = l.isNullAt(lKeyIdx(i))
            if (cmpNullable(heldKeyNull(i), heldKeyVal(i),
                ln, if (ln) 0L else read(l, lKeyIdx(i), keyCode(i))) != 0) return false
            i += 1
          }
          true
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          if (fwd) {
            var cmp = if (rRow == null) 1 else cmpKeysRL(rRow, l)
            while (rRow != null &&
                (cmp < 0 || (cmp == 0 && cmpTimeRL(rRow, l) < 0))) {
              advanceRight()
              cmp = if (rRow == null) 1 else cmpKeysRL(rRow, l)
            }
            val lTimeNull = l.isNullAt(lTimeIdx)
            val matched = rRow != null && cmp == 0 && !lTimeNull &&
              (tol < 0 ||
                (!rRow.isNullAt(rTimeIdx) &&
                  read(rRow, rTimeIdx, timeCode) - read(l, lTimeIdx, timeCode) <= tol))
            outProj(joined(l, if (matched) payloadProj(rRow) else nullPayload))
          } else {
            var cmp = if (rRow == null) 1 else cmpKeysRL(rRow, l)
            while (rRow != null &&
                (cmp < 0 || (cmp == 0 && cmpTimeRL(rRow, l) <= 0))) {
              if (cmp == 0) holdRight()
              advanceRight()
              cmp = if (rRow == null) 1 else cmpKeysRL(rRow, l)
            }
            val matched = heldValid && heldMatches(l) &&
              (tol < 0 ||
                (!heldTimeNull && !l.isNullAt(lTimeIdx) &&
                  read(l, lTimeIdx, timeCode) - heldTimeUs <= tol))
            outProj(joined(l, if (matched) heldPayload else nullPayload))
          }
        }
      }
    }
  }

  private def doExecuteGeneric(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val payloadExprs = payload
    val outExprs = output
    // snapshot to locals: field reads inside the partition closure would
    // capture (and serialize) the whole plan node per task
    val tol = toleranceUs.getOrElse(-1L)
    val fwd = forward

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val outProj = UnsafeProjection.create(outExprs, lOut ++ payloadOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullPayload = new GenericInternalRow(payloadExprs.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // right-side lookahead
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        // last right row consumed whose key matched the group it was in
        private var heldKey: UnsafeRow = _
        private var heldPayload: UnsafeRow = _
        private var heldTimeUs: Long = Long.MinValue
        private var heldTimeNull: Boolean = true

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            rTime = rTimeProj(rRow)
          } else { rRow = null; rKey = null; rTime = null }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          if (fwd) {
            // skip right rows strictly before (lKey, lTime); the
            // lookahead itself is then the first at-or-after row —
            // earliest time, smallest payload on ties, by sort order.
            // A null left time matches nothing (mirrors `ts <= err.ts`
            // SQL semantics, where NULL never compares true).
            var cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
            while (rRow != null &&
                (cmp < 0 || (cmp == 0 && timeOrd.compare(rTime, lTime) < 0))) {
              advanceRight()
              cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
            }
            val matched = rRow != null && cmp == 0 && !lTime.isNullAt(0) &&
              (tol < 0 ||
                (!rTime.isNullAt(0) &&
                  rTime.getLong(0) - lTime.getLong(0) <= tol))
            outProj(joined(l, if (matched) payloadProj(rRow) else nullPayload))
          } else {
            // consume right rows at-or-before (lKey, lTime); the LAST
            // one with a matching key is the as-of match (sort order
            // makes that the latest time, greatest payload)
            var cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
            while (rRow != null &&
                (cmp < 0 || (cmp == 0 && timeOrd.compare(rTime, lTime) <= 0))) {
              if (cmp == 0) {
                heldKey = rKey.copy()
                heldPayload = payloadProj(rRow).copy()
                heldTimeNull = rTime.isNullAt(0)
                heldTimeUs = if (heldTimeNull) Long.MinValue else rTime.getLong(0)
              }
              advanceRight()
              cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
            }
            val matched =
              heldKey != null && keyOrd.compare(heldKey, lKey) == 0 &&
                (tol < 0 ||
                  (!heldTimeNull && !lTime.isNullAt(0) &&
                    lTime.getLong(0) - heldTimeUs <= tol))
            outProj(joined(l, if (matched) heldPayload else nullPayload))
          }
        }
      }
    }
  }
}
