package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench tooling (not part of the driver contract): replicate the
  * driver's sf0.1 tables ~10× into a repo-local directory so shuffle
  * and spill behavior can be observed one decade above the largest
  * driver SF (VERDICT round-2 follow-up #6).
  *
  * Replication is NOT naive duplication — that would multiply every
  * key's cardinality and every duplicate cluster instead of growing
  * the corpus, so dedup/similarity queries would measure a distorted
  * workload. Each replica i is made independent:
  *   - join keys shift by i·10⁹ (replica key spaces are disjoint);
  *   - embeddings rotate by i positions — rotation preserves every
  *     within-replica dot product exactly while cross-replica cosines
  *     become uncorrelated (no planted cross-replica near-dups);
  *   - document text maps through a replica-specific character
  *     permutation — injective, so within-replica shingle Jaccard is
  *     preserved exactly while cross-replica shingle sets disjoint;
  *   - event users/ids shift so session and funnel cardinalities scale
  *     linearly (same per-user history length).
  * region/nation stay fixed (dimensions don't grow with fact volume).
  */
object ScaleUp {

  private val K = 1000000000L // per-replica key offset
  private val Alphabet = "aeiousnrtl" // rotated per replica for text

  private def replicate(df: DataFrame, n: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(i => f(df, i)).reduce(_.unionAll(_))

  private def shift(c: String, i: Int): Column = col(c) + lit(i.toLong * K)

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/target/sf1ish"
    val n = if (args.length > 2) args(2).toInt else 10
    // independence breaks past the permutation/rotation period: replica
    // 10 would reuse replica 0's identity text mapping (and rotation
    // wraps at the embedding dim), planting exactly the cross-replica
    // duplicates this tool exists to avoid
    require(n >= 1 && n <= Alphabet.length,
      s"replica independence holds only for 1..${Alphabet.length} replicas, got $n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def w(df: DataFrame, name: String) =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    w(t("region"), "region")
    w(t("nation"), "nation")

    w(replicate(t("customer"), n)((d, i) =>
      d.withColumn("c_custkey", shift("c_custkey", i))), "customer")
    w(replicate(t("supplier"), n)((d, i) =>
      d.withColumn("s_suppkey", shift("s_suppkey", i))), "supplier")
    w(replicate(t("part"), n)((d, i) =>
      d.withColumn("p_partkey", shift("p_partkey", i))), "part")
    w(replicate(t("orders"), n)((d, i) =>
      d.withColumn("o_orderkey", shift("o_orderkey", i))
        .withColumn("o_custkey", shift("o_custkey", i))), "orders")
    w(replicate(t("lineitem"), n)((d, i) =>
      d.withColumn("l_orderkey", shift("l_orderkey", i))
        .withColumn("l_partkey", shift("l_partkey", i))
        .withColumn("l_suppkey", shift("l_suppkey", i))), "lineitem")

    // ts arrives as raw int64 nanos (legacy conf above) and is written
    // back as BIGINT — exactly how every events query reads it
    w(replicate(t("events"), n)((d, i) =>
      d.withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))), "events")

    w(replicate(t("documents"), n)((d, i) => {
      val rotated = Alphabet.drop(i % Alphabet.length) + Alphabet.take(i % Alphabet.length)
      d.withColumn("doc_id", shift("doc_id", i))
        .withColumn("text", translate(col("text"), Alphabet, rotated))
    }), "documents")

    w(replicate(t("embeddings"), n)((d, i) =>
      d.withColumn("vec_id", shift("vec_id", i))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else concat(
            slice(col("embedding"), i + 1, 100000),
            slice(col("embedding"), 1, i)))), "embeddings")

    println(s"""{"scaled":"$out","replicas":$n}""")
    spark.stop()
  }
}
