package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-partition streaming "first n rows per key" prune — the bound
  * that keeps per-key top-N selections from buffering a whole hot key
  * in one task. sortWithinPartitions co-sorts each partition by
  * (key, order...), then a constant-memory scan keeps at most n rows
  * per key per partition. The global top-N by the same order is always
  * a subset of the per-partition top-Ns, so an EXACT selection (window
  * rank) over the pruned frame — now ≤ n × #partitions rows per key,
  * regardless of corpus size — returns the identical result. Used by
  * exact-N sampling and k-NN vote; the same shape as the dedup df-cap
  * groupBy+join fix, applied to ordered selection. */
object PartitionPrune {

  /** PRECONDITIONS (losslessness of the downstream exact selection):
    *  - `keyCol` must be an atomic type (string/numeric/bool/date/
    *    timestamp/decimal). Array/binary/map/struct keys are rejected:
    *    the scan compares consecutive keys with JVM equality, and
    *    arrays (`Array[Byte]` for binary) never compare equal, which
    *    would silently reset the counter every row and disable the
    *    bound.
    *  - `sortCols` must totally order rows within a key (e.g. include
    *    a unique tiebreak column); with ties at the cut boundary the
    *    kept n rows per partition may not contain the rows the global
    *    window rank would pick. Current callers pass a unique id as the
    *    last sort column. */
  def firstNPerKey(df: DataFrame, keyCol: String, sortCols: Seq[Column],
                   n: Int): DataFrame = {
    val schema = df.schema
    val kIdx = schema.fieldIndex(keyCol)
    schema(kIdx).dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType |
           org.apache.spark.sql.types.BinaryType =>
        throw new IllegalArgumentException(
          s"firstNPerKey key '$keyCol' has non-atomic type ${schema(kIdx).dataType}; " +
            "JVM equality on such keys resets the per-key counter every row, " +
            "silently disabling the bound — use an atomic key (e.g. a hash of it)")
      case _ =>
    }
    df.sortWithinPartitions(col(keyCol) +: sortCols: _*)
      .mapPartitions { it =>
        var started = false
        var cur: Any = null
        var cnt = 0
        it.filter { r =>
          val s = r.get(kIdx)
          if (!started || s != cur) { started = true; cur = s; cnt = 0 }
          cnt += 1
          cnt <= n
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }
}
