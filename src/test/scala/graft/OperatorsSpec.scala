package graft

class Scd2Spec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, lit, when}
  import graft.operators.Scd2

  private def dim(rows: (Int, String, String, Int, Option[Int])*) =
    rows.toDF("id", "nome", "grupo", "valid_from", "valid_to")

  test("SCD-2 merge: new keys open, changed keys version, unchanged/absent untouched") {
    val v1 = dim((1, "a", "g1", 1, None), (2, "b", "g1", 1, None))
    // batch at v2: key 1 changes grupo, key 2 unchanged, key 3 new
    val batch = Seq((1, "a", "g2"), (2, "b", "g1"), (3, "c", "g1"))
      .toDF("id", "nome", "grupo")
    val v2 = Scd2.merge(v1, batch, keys = Seq("id"),
      attrs = Seq("nome", "grupo"), version = 2)
    val rows = v2.as[(Int, String, String, Int, Option[Int])]
      .collect().sortBy(r => (r._1, r._4))
    assert(rows.toSeq === Seq(
      (1, "a", "g1", 1, Some(2)), // closed at v2
      (1, "a", "g2", 2, None),    // reopened with new attrs
      (2, "b", "g1", 1, None),    // unchanged
      (3, "c", "g1", 2, None)))   // new key
    // time travel: as-of v1 sees the original attributes only
    val asOf1 = Scd2.asOf(v2, 1).select("id", "grupo")
      .as[(Int, String)].collect().sortBy(_._1)
    assert(asOf1.toSeq === Seq((1, "g1"), (2, "g1")))
    // idempotency: merging the same batch again changes nothing
    val v3 = Scd2.merge(v2, batch, Seq("id"), Seq("nome", "grupo"), version = 3)
    assert(v3.exceptAll(v2).count() === 0 && v2.exceptAll(v3).count() === 0)
  }

  test("SCD-2 merge: NULL natural-key values are legal keys, not dropped rows") {
    val v1 = dim((1, "a", "g1", 1, None))
      .withColumn("id", when(col("id") === 1, lit(null)).otherwise(col("id")).cast("int"))
    val batch = Seq((Option.empty[Int], "a", "g2")).toDF("id", "nome", "grupo")
    val v2 = Scd2.merge(v1, batch, Seq("id"), Seq("nome", "grupo"), version = 2)
    // the null-keyed row versions normally: one closed + one open
    assert(v2.count() === 2)
    assert(v2.filter(col("valid_to").isNull).select("grupo")
      .as[String].head() === "g2")
  }

  test("SCD-2 merge: a key repeated in one batch reduces to one deterministic winner") {
    val v1 = dim((1, "a", "g1", 1, None))
    val batch = Seq((1, "a", "g3"), (1, "a", "g2")).toDF("id", "nome", "grupo")
    val v2 = Scd2.merge(v1, batch, Seq("id"), Seq("nome", "grupo"), version = 2)
    val open = v2.filter(col("valid_to").isNull)
      .as[(Int, String, String, Int, Option[Int])].collect()
    assert(open.length === 1)           // exactly one open row per key
    assert(open.head._3 === "g3")       // max over (nome, grupo) struct
    assert(v2.count() === 2)            // closed v1 row + one new open row
  }

  test("SCD-2 merge: orderCol overrides the attribute-struct tie-break") {
    val v1 = dim((1, "a", "g1", 1, None))
    // without orderCol the (nome, grupo) struct would pick g3; the
    // sequence number says g2 is the later record
    val batch = Seq((1, "a", "g3", 10L), (1, "a", "g2", 20L))
      .toDF("id", "nome", "grupo", "seq")
    val v2 = Scd2.merge(v1, batch, Seq("id"), Seq("nome", "grupo"),
      version = 2, orderCol = Some("seq"))
    val open = v2.filter(col("valid_to").isNull)
      .as[(Int, String, String, Int, Option[Int])].collect()
    assert(open.length === 1)
    assert(open.head._3 === "g2") // max seq wins, not max attr struct
  }

  test("SCD-2 merge: orderCol may also be a tracked attribute") {
    // ingest timestamps are usually tracked AND used for ordering; the
    // winner struct must not produce duplicate field names
    val v1 = Seq((1, "a", 5L, 1, Option.empty[Int]))
      .toDF("id", "nome", "updated_at", "valid_from", "valid_to")
    val batch = Seq((1, "b", 10L), (1, "c", 20L)).toDF("id", "nome", "updated_at")
    val v2 = Scd2.merge(v1, batch, Seq("id"), Seq("nome", "updated_at"),
      version = 2, orderCol = Some("updated_at"))
    val open = v2.filter(col("valid_to").isNull)
      .as[(Int, String, Long, Int, Option[Int])].collect()
    assert(open.length === 1)
    assert(open.head._2 === "c" && open.head._3 === 20L)
  }

  test("SCD-2 merge: null attributes compare null-safely") {
    val v1 = dim((1, "a", "g1", 1, None))
      .withColumn("grupo", org.apache.spark.sql.functions.lit(null).cast("string"))
    val batch = Seq((1, "a", Option.empty[String])).toDF("id", "nome", "grupo")
    val v2 = Scd2.merge(v1, batch, Seq("id"), Seq("nome", "grupo"), version = 2)
    assert(v2.count() === 1) // null == null under <=>, no spurious version
  }
}

import org.apache.spark.sql.functions._
import graft.operators.{MergeIgnore, MergeUpsert, SurrogateKeys}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("MergeIgnore.newRows: dedups batch and excludes existing keys") {
    val batch = Seq((1, "a"), (1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val existing = Seq((2, "b")).toDF("k", "v")
    val out = MergeIgnore.newRows(batch, existing, Seq("k"))
      .select("k").as[Int].collect().sorted
    assert(out.toSeq === Seq(1, 3))
  }

  test("MergeIgnore is idempotent: second application of same batch adds nothing") {
    val batch = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val afterFirst = MergeIgnore.newRows(batch, null, Seq("k"))
    val second = MergeIgnore.newRows(batch, afterFirst, Seq("k"))
    assert(second.count() === 0)
  }

  test("MergeUpsert.upsert: updates matched, inserts new, keeps untouched; latest batch row wins") {
    val existing = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("id", "name", "bal")
    val batch = Seq(
      (2, "b1", 21.0, 1), (2, "b2", 22.0, 2), // conflicting versions: seq 2 wins
      (4, "d", 40.0, 1))                      // new key → insert
      .toDF("id", "name", "bal", "seq")
    val out = MergeUpsert.upsert(existing, batch, Seq("id"), orderBy = Seq(col("seq")))
    // ordering column stays in the batch, never in the result
    assert(out.columns.toSeq === Seq("id", "name", "bal"))
    val rows = out.as[(Int, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1, "a", 10.0),  // untouched
      (2, "b2", 22.0), // replaced by latest batch version
      (3, "c", 30.0),  // untouched
      (4, "d", 40.0))) // inserted
  }

  test("MergeUpsert.upsert: idempotent — re-merging the same batch changes nothing") {
    val batch = Seq((1, "a", 1.0, 1), (2, "b", 2.0, 1)).toDF("id", "name", "bal", "seq")
    val first = MergeUpsert.upsert(null, batch, Seq("id"), Seq(col("seq")))
    val again = MergeUpsert.upsert(first, batch, Seq("id"), Seq(col("seq")))
    assert(again.exceptAll(first).count() === 0 && first.exceptAll(again).count() === 0)
  }

  test("IncrementalAgg: merged partials equal the direct aggregate (nulls, one-sided groups)") {
    import graft.operators.IncrementalAgg
    import graft.operators.IncrementalAgg.AggSpec
    // group "a" spans both batches (merge path), "b"/"c" exist on one
    // side only (pass-through path); nulls exercise count(*)-vs-count(v)
    // and sum/min/max null-skipping through the merge
    val b1 = Seq(("a", Option(1)), ("a", Option.empty[Int]), ("b", Option(5))).toDF("k", "v")
    val b2 = Seq(("a", Option(3)), ("c", Option(7))).toDF("k", "v")
    val aggs = Seq(AggSpec("n", "count", "*"), AggSpec("nv", "count", "v"),
      AggSpec("s", "sum", "v"), AggSpec("mn", "min", "v"), AggSpec("mx", "max", "v"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val merged = IncrementalAgg.merge(
      IncrementalAgg.partial(b1, Seq("k"), aggs),
      IncrementalAgg.partial(b2, Seq("k"), aggs), Seq("k"), aggs)
    val direct = IncrementalAgg.partial(b1.unionAll(b2), Seq("k"), aggs)
    assert(sorted(merged) === sorted(direct))
  }

  test("IncrementalAgg: decimal sums keep the first version's schema across merges") {
    import graft.operators.IncrementalAgg
    import graft.operators.IncrementalAgg.AggSpec
    val aggs = Seq(AggSpec("s", "sum", "v"))
    val mk = (x: String) => Seq(("a", new java.math.BigDecimal(x))).toDF("k", "v")
      .withColumn("v", col("v").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
    val p0 = IncrementalAgg.partial(mk("1.50"), Seq("k"), aggs)
    // each re-sum would widen precision by 10; the cast-back must hold
    // the maintained schema at the FIRST version's dtypes forever
    val m1 = IncrementalAgg.merge(p0, IncrementalAgg.partial(mk("2.25"), Seq("k"), aggs), Seq("k"), aggs)
    val m2 = IncrementalAgg.merge(m1, IncrementalAgg.partial(mk("0.25"), Seq("k"), aggs), Seq("k"), aggs)
    assert(m1.schema("s").dataType === p0.schema("s").dataType)
    assert(m2.schema("s").dataType === p0.schema("s").dataType)
    assert(m2.select("s").as[java.math.BigDecimal].head() ===
      new java.math.BigDecimal("4.00"))
  }

  test("IncrementalAgg rejects non-decomposable aggregates loudly") {
    import graft.operators.IncrementalAgg.AggSpec
    val e = intercept[IllegalArgumentException](AggSpec("a", "avg", "v"))
    assert(e.getMessage.contains("decomposable"))
  }

  test("SurrogateKeys.assign: dense 1..n in key order, offset respected") {
    val df = Seq("b", "c", "a").toDF("nome")
    val out = SurrogateKeys.assign(df, "id", Seq("nome"), offset = 10)
      .orderBy("id").as[(String, Int)].collect()
    assert(out.toSeq === Seq(("a", 11), ("b", 12), ("c", 13)))
  }

  test("SurrogateKeys.assignScalable: dense ids equal to window-based assignment") {
    val df = (1 to 1000).map(i => (i % 7, s"name_$i")).toDF("grp", "nome")
    val ids = SurrogateKeys.assignScalable(df, "id", Seq("nome"), offset = 5)
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq === (6L to 1005L))
  }

  test("SurrogateKeys.assignBounded: identical (key, id) mapping to assignScalable") {
    // the bounded one-job path must assign the SAME dense long ids as
    // the scalable two-pass path — the Warehouse switches between them
    // on batch size, so they must be interchangeable row-for-row
    val df = (1 to 2000).map(i => s"name_${i % 997}_$i").toDF("nome").repartition(13)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("nome", "id").as[(String, Long)].collect().toMap
    val bounded = pairs(SurrogateKeys.assignBounded(df, "id", Seq("nome"), offset = 42))
    val scalable = pairs(SurrogateKeys.assignScalable(df, "id", Seq("nome"), offset = 42))
    assert(bounded === scalable)
    assert(bounded.values.min === 43L && bounded.values.max === 2042L)
  }
}
