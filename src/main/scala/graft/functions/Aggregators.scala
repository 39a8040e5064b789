package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators — the UDAF surface of the engine (SURVEY.md
  * §2.9 row "UDF/UDAF/UDTF"). Spark's `Aggregator` is the right altitude
  * for order-statistics the built-ins can't stream: state is a bounded
  * buffer per group, partially aggregated map-side and merged
  * associatively, so shuffle volume is O(groups × k) — not O(rows) like
  * the window-function rewrite (which must shuffle and sort every row).
  */
object Aggregators {

  /** One scored row entering the top-k: ordering is (value DESC, id ASC) —
    * the id is the deterministic tie-break, engine-wide convention. */
  final case class Scored(value: Double, id: Long)

  /** Bounded top-k per group: keeps the k greatest Scored rows. The buffer
    * is a sorted Vector capped at k, so reduce/merge are O(k); both are
    * associative and commutative, which is what makes the map-side partial
    * aggregation correct. */
  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0, "top-k needs k > 0")

    // Double.compare, not >: matches Spark's SQL total order exactly
    // (NaN greatest — so NaN scores rank FIRST under desc, as the
    // row_number window and the DuckDB oracle both order them — and
    // -0.0 < 0.0), keeping the aggregator bit-compatible with the
    // window-function form on every input, zero-norm cosines included.
    private def better(a: Scored, b: Scored): Boolean = {
      val c = java.lang.Double.compare(a.value, b.value)
      c > 0 || (c == 0 && a.id < b.id)
    }

    private def trim(s: Seq[Scored]): Seq[Scored] =
      s.sortWith(better).take(k)

    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
      trim(buf :+ in)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      trim(a ++ b)
    override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf)
    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }
}
