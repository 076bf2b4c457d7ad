package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the 4× memory/bandwidth cut
  * an ANN index takes before scale-out (a 100 TB float corpus becomes
  * 25 TB of int8 + one scale per vector; probe re-ranking dequantizes
  * on the fly).
  *
  * Per vector: scale = 127 / max|x|, q_i = clamp(round(x_i · scale)),
  * err_i = |q_i / scale − x_i|. Zero vectors carry no direction and are
  * excluded (scale undefined). Output is flattened to one row per
  * (vector, dimension) so results hash portably.
  *
  * 100 TB shape: a pure projection — no shuffle, no state; the explode
  * is the output format, not a join fan-out. (For the production path
  * the quantized array would stay packed as binary; the flat form here
  * is the verification-friendly face.)
  */
object Quantize {

  def int8(df: DataFrame, idCol: String, vecCol: String,
      roundTo: Int = 6): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxabs = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / col("__m")
    val q = greatest(lit(-127.0), least(lit(127.0),
      round(col("x") * scale, 0))).cast("int")
    df.select(col(idCol), v.as("__v"), maxabs.as("__m"))
      .where(col("__m") > 0)
      .select(col(idCol), col("__m"),
        posexplode(col("__v")).as(Seq("dim", "x")))
      .select(col(idCol),
        col("dim").cast("int").as("dim"),
        q.as("q"),
        round(abs(q.cast("double") / scale - col("x")), roundTo).as("err"))
  }
}
