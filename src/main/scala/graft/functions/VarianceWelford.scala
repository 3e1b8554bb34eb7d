package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Welford/Chan online variance as a typed Aggregator — graft's
  * demonstration of the custom-aggregation API surface (reduce +
  * numerically-stable MERGE, the shape any distributed sketch needs:
  * per-partition partial aggregation, pairwise combine on the reduce
  * side).
  *
  * For plain variance the built-in `var_samp` is preferred (codegen'd);
  * the oracle query computes BOTH and the gate asserts they agree with
  * DuckDB's var_samp to 4 decimals.
  */
final case class WelfordState(n: Long, mean: Double, m2: Double)

object VarianceWelford extends Aggregator[Double, WelfordState, Double] {
  type State = WelfordState
  private def State(n: Long, mean: Double, m2: Double) = WelfordState(n, mean, m2)

  override def zero: State = State(0L, 0.0, 0.0)

  override def reduce(s: State, x: Double): State = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    State(n, mean, s.m2 + d * (x - mean))
  }

  /** Chan et al. parallel combine — exact for the statistic, stable for
    * wildly unbalanced partition sizes. */
  override def merge(a: State, b: State): State = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      State(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
    }
  }

  override def finish(s: State): Double =
    if (s.n < 2) Double.NaN else s.m2 / (s.n - 1)

  override def bufferEncoder: Encoder[State] = Encoders.product[State]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
