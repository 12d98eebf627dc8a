package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-deterministic rounding.
  *
  * Spark's `round(x, 4)` rounds the shortest decimal representation
  * (BigDecimal.valueOf) while DuckDB's rounds via binary `x * 10^4`; at
  * values whose scaled form lands exactly on .5 in one representation but
  * not the other, the two disagree (observed: 0.49125, 1222.745). Both
  * sides of every oracle pair therefore use the same IEEE formula —
  * `floor(x * 10000 + 0.5) / 10000` — which is bit-identical across
  * engines because every step is a deterministic double operation.
  */
object Det {
  def r4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
}
