package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Contiguous 0-based example ids following a caller-named total
  * order — the export-numbering primitive a training-data pipeline
  * needs when shards must carry globally consecutive ids (resumable
  * downloads, deterministic example addressing, "example 734M" bug
  * reports). The reference has no export surface; this is part of the
  * large-scale pipeline extension mandate.
  *
  * This is THE one operator whose contract legitimately requires a
  * global ordered layout: `repartitionByRange` + in-partition sort is
  * the scalable form of ORDER BY (each executor sorts its range;
  * nothing funnels through one task), and ids attach via RDD
  * `zipWithIndex` — one count pass to learn partition sizes, one map
  * to add each partition's offset. No window over the corpus, no
  * single-partition stage, exactly one range exchange.
  *
  * Determinism: range-bound SAMPLING only decides where partitions
  * split, never the order — with a unique `orderCols` key the
  * (range layout, in-partition sort, zipWithIndex) composition yields
  * ids that equal `row_number() OVER (ORDER BY orderCols) - 1` on any
  * run, any partition count, any sampled bounds (InvarianceSpec-style
  * property pinned in the spec).
  *
  * The `.rdd` hop deserializes rows once — the documented cost of
  * zipWithIndex (mapPartitions-family, SURVEY's "last resort" tier);
  * a Catalyst-only alternative (window over `spark_partition_id`)
  * would re-shuffle by partition id, paying a second full exchange to
  * avoid the codec hop.
  */
object ContiguousIds {

  /** Appends `idCol` (BIGINT, 0-based, contiguous, dense) following
    * the `orderCols` lexicographic order. `orderCols` must form a
    * unique key — equal keys would make the assignment arbitrary
    * within the tie. */
  def assign(df: DataFrame, orderCols: Seq[String], idCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val withId = sorted.rdd.zipWithIndex().map {
      case (r, i) => Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withId, schema)
  }
}
