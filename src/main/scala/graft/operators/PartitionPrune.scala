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

  def firstNPerKey(df: DataFrame, keyCol: String, sortCols: Seq[Column],
                   n: Int): DataFrame = {
    val schema = df.schema
    val kIdx = schema.fieldIndex(keyCol)
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
