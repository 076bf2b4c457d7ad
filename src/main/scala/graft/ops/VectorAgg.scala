package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.2): per-group mean of embedding
  * vectors, as an `Aggregator` with a mutable primitive buffer —
  * map-side partial aggregation comes for free from the Aggregator
  * contract (reduce on executors, merge across partitions), so the
  * shuffle carries one (sum, count) pair per group, not the vectors.
  */
object VectorAgg {

  final case class VBuf(sums: Array[Double], n: Long)

  class VectorMean(dim: Int) extends Aggregator[Array[Float], VBuf, Array[Double]] {
    override def zero: VBuf = VBuf(new Array[Double](dim), 0L)

    override def reduce(b: VBuf, v: Array[Float]): VBuf = {
      var i = 0
      while (i < dim && i < v.length) { b.sums(i) += v(i); i += 1 }
      VBuf(b.sums, b.n + 1)
    }

    override def merge(a: VBuf, b: VBuf): VBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      VBuf(a.sums, a.n + b.n)
    }

    override def finish(b: VBuf): Array[Double] =
      if (b.n == 0) new Array[Double](dim) else b.sums.map(_ / b.n)

    override def bufferEncoder: Encoder[VBuf] = Encoders.product[VBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  def vectorMean(dim: Int): VectorMean = new VectorMean(dim)
}
