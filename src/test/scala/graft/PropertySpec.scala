package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.LedgerFunctions._
import graft.ledger.{Catalog, Ingest, Warehouse}

/** Property-based invariants (SURVEY §5-2): money round-trip, warehouse
  * idempotency, and referential integrity over generated batches.
  * (ScalaCheck Gen driven directly — the scalatestplus bridge is not in
  * the offline dependency cache.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val moneyGen: Gen[BigDecimal] = for {
    units <- Gen.chooseNum(0L, 9999999999999L) // fits DECIMAL(15,2)
    cents <- Gen.chooseNum(0, 99)
  } yield BigDecimal(units) + BigDecimal(cents) / 100

  private def toBrl(d: BigDecimal): String = {
    val s = d.setScale(2).toString
    val Array(ip, fp) = s.split("\\.")
    ip.reverse.grouped(3).mkString(".").reverse + "," + fp
  }

  test("property: BRL format → parse is the identity on DECIMAL(15,2)") {
    for (seed <- 1L to 10L) {
      val ds = sample(Gen.listOfN(50, moneyGen), seed)
      val out = ds.map(toBrl).toDF("v")
        .select(parseBrazilianMoney(col("v")).cast("string"))
        .as[String].collect().map(BigDecimal(_))
      assert(out.toSeq === ds.map(_.setScale(2)), s"seed=$seed")
    }
  }

  private val word = Gen.oneOf("Casa", "Luz", "Água", "Ação", " Mercado ", "x")
  private val rowGen: Gen[(String, String, String, String, String, String, String)] =
    for {
      desc <- Gen.oneOf("Compra mensal", "Pagamento", "Açaí é bom")
      tipo <- Gen.oneOf("Receita", "Despesa")
      grupo <- word; cat <- word
      cls <- Gen.oneOf("Fixo", "Variável")
      mes <- Gen.chooseNum(1, 12)
      valor <- moneyGen
    } yield (desc, tipo, grupo, cat, cls, f"$mes%02d/2025", toBrl(valor))

  test("property: as-of join equals the naive latest-at-or-before scan, nulls included") {
    import graft.operators.AsOfJoin
    val rightGen = Gen.listOfN(30, for {
      k <- Gen.oneOf("A", "B", "C")
      t <- Gen.chooseNum(0L, 50L)
      price <- Gen.option(Gen.chooseNum(1, 999).map(_.toDouble))
      aux <- Gen.option(Gen.chooseNum(1, 9))
    } yield (k, t, price, aux))
    val leftGen = Gen.listOfN(40, for {
      k <- Gen.oneOf("A", "B", "C")
      t <- Gen.chooseNum(0L, 60L)
    } yield (k, t))
    for (seed <- 1L to 5L) {
      // contract: right unique per (key, time)
      val rights = sample(rightGen, seed)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val lefts = sample(leftGen, seed + 100).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val out = AsOfJoin.lastAtOrBefore(
        lefts.toDF("lid", "k", "t"),
        rights.toDF("k", "rt", "price", "aux"),
        Seq("k"), leftTime = "t", rightTime = "rt",
        payload = Seq("price", "aux"))
        .select("lid", "price", "aux")
        .as[(Long, Option[Double], Option[Int])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val expected = lefts.map { case (lid, k, t) =>
        val m = rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        lid -> (m.flatMap(_._3), m.flatMap(_._4))
      }.toMap
      assert(out === expected, s"seed=$seed")
    }
  }

  test("property: nearest join equals the naive min-distance scan, ties backward") {
    import graft.operators.AsOfJoin
    val rightGen = Gen.listOfN(25, for {
      k <- Gen.oneOf("A", "B", "C")
      t <- Gen.chooseNum(0L, 50L)
      price <- Gen.chooseNum(1, 999).map(_.toDouble)
    } yield (k, t, price))
    val leftGen = Gen.listOfN(40, for {
      k <- Gen.oneOf("A", "B", "C", "D") // D: keyless side
      t <- Gen.chooseNum(0L, 60L)
    } yield (k, t))
    for (seed <- 1L to 5L) {
      val rights = sample(rightGen, seed)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val lefts = sample(leftGen, seed + 100).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val out = AsOfJoin.nearest(
        lefts.toDF("lid", "k", "t"),
        rights.toDF("k", "rt", "price"),
        Seq("k"), leftTime = "t", rightTime = "rt",
        payload = Seq("rt", "price"))
        .select("lid", "rt", "price")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val expected = lefts.map { case (lid, k, t) =>
        val cands = rights.filter(_._1 == k)
        val m =
          if (cands.isEmpty) None
          // min distance; tie -> the earlier (backward) candidate
          else Some(cands.minBy(r => (math.abs(r._2 - t), r._2)))
        lid -> (m.map(_._2), m.map(_._3))
      }.toMap
      assert(out === expected, s"seed=$seed")
    }
  }

  test("property: skyline sweep equals the brute-force dominance filter") {
    import org.apache.spark.sql.expressions.Window
    val ptGen = Gen.listOfN(60, for {
      g <- Gen.oneOf("P1", "P2")
      x <- Gen.chooseNum(0L, 20L)
      y <- Gen.chooseNum(0L, 20L)
    } yield (g, x, y))
    for (seed <- 1L to 5L) {
      val pts = sample(ptGen, seed).distinct
      // the q114 shape: distinct (x, y) points per group, then the sweep
      val df = pts.toDF("g", "x", "y").distinct()
      val w = Window.partitionBy(col("g")).orderBy(col("x"), col("y"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val got = df
        .withColumn("best_prev", min(col("y")).over(w))
        .filter(col("best_prev").isNull || col("y") < col("best_prev"))
        .select("g", "x", "y").as[(String, Long, Long)].collect().toSet
      val want = pts.toSet.filter { p: (String, Long, Long) =>
        !pts.exists(q =>
          q._1 == p._1 && q._2 <= p._2 && q._3 <= p._3 &&
            (q._2 < p._2 || q._3 < p._3))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: weighted median equals the brute-force half-mass scan") {
    import org.apache.spark.sql.expressions.Window
    val rowGen = Gen.listOfN(50, for {
      g <- Gen.oneOf("A", "B")
      v <- Gen.chooseNum(1L, 12L)
      wt <- Gen.chooseNum(1L, 100L)
    } yield (g, v, wt))
    for (seed <- 1L to 5L) {
      val rows = sample(rowGen, seed)
      val byVal = rows.toDF("g", "v", "w")
        .groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
      val cum = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("g"))
      val got = byVal
        .withColumn("cum", sum(col("w")).over(cum))
        .withColumn("total", sum(col("w")).over(whole))
        .filter(col("cum") * 2 >= col("total") &&
          (col("cum") - col("w")) * 2 < col("total"))
        .select("g", "v").as[(String, Long)].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val total = rs.map(_._3).sum
        // smallest v whose cumulative weight reaches half the total
        val sorted = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toList.sortBy(_._1)
        var acc = 0L
        g -> sorted.find { case (_, wt) => acc += wt; acc * 2 >= total }.get._1
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: CUSUM change points equal the sequential running-deviation scan") {
    import org.apache.spark.sql.expressions.Window
    // the q116 shape: hourly counts per series, Dev_i = n_i*H - total,
    // Cum_j exact in BIGINT, shift iff 10*|Cum| > total*H — replayed
    // here against a per-series sequential fold. Buckets may be sparse
    // (hours with zero events simply don't exist, as in the query).
    val evGen = Gen.listOfN(120, for {
      g <- Gen.oneOf("view", "click")
      h <- Gen.chooseNum(0L, 15L)
    } yield (g, h))
    for (seed <- 1L to 5L) {
      val evs = sample(evGen, seed)
      val hourly = evs.toDF("g", "hus").groupBy(col("g"), col("hus"))
        .agg(count(lit(1)).as("n"))
      val whole = Window.partitionBy(col("g"))
      val cum = Window.partitionBy(col("g")).orderBy(col("hus"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = hourly
        .withColumn("total", sum(col("n")).over(whole))
        .withColumn("h", count(col("n")).over(whole))
        .withColumn("cum_dev_scaled",
          sum(col("n") * col("h") - col("total")).over(cum))
        .select(col("g"), col("hus"), col("n"), col("cum_dev_scaled"),
          (abs(col("cum_dev_scaled")) * 10 > col("total") * col("h")).as("s"))
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      val want = evs.groupBy(_._1).flatMap { case (g, rs) =>
        val counts = rs.groupBy(_._2).view.mapValues(_.size.toLong)
          .toList.sortBy(_._1)
        val total = counts.map(_._2).sum
        val h = counts.length.toLong
        var acc = 0L
        counts.map { case (hus, n) =>
          acc += n * h - total
          (g, hus, n, acc, math.abs(acc) * 10 > total * h)
        }
      }.toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: TWAP equals the sequential hold-until-next integral") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // the q118 shape: value holds until the user's next event; exact
    // cents×µs products in DECIMAL(38,0), one final double division —
    // vs a BigInt fold. Tied timestamps (distinct ids) included: the
    // (t, id) order is total, zero-duration segments contribute 0.
    val evGen = Gen.listOfN(40, for {
      u <- Gen.chooseNum(1L, 4L)
      t <- Gen.chooseNum(0L, 30L)
      vc <- Gen.chooseNum(0L, 99999L) // cents
    } yield (u, t, vc))
    for (seed <- 1L to 5L) {
      val evs = sample(evGen, seed).zipWithIndex
        .map { case ((u, t, vc), i) => (u, t, i.toLong, vc) }
      val w = Window.partitionBy(col("u")).orderBy(col("t"), col("id"))
      val got = evs.toDF("u", "t", "id", "v_c")
        .withColumn("dur", coalesce(lead(col("t"), 1).over(w) - col("t"), lit(0L)))
        .groupBy(col("u"))
        .agg(count(lit(1)).as("n"), sum(col("dur")).as("held"),
          sum(col("v_c").cast(DecimalType(38, 0)) * col("dur")).as("wv"))
        .filter(col("held") > 0)
        .select(col("u"), col("n"), col("held"),
          (col("wv").cast("double") / col("held").cast("double")).as("twap"))
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val want = evs.groupBy(_._1).flatMap { case (u, rs) =>
        val s = rs.sortBy(r => (r._2, r._3))
        val durs = s.zip(s.drop(1)).map { case (a, b) => b._2 - a._2 } :+ 0L
        val held = durs.sum
        if (held == 0) None
        else {
          val wv = s.zip(durs).map { case (r, d) => BigInt(r._4) * BigInt(d) }.sum
          Some(u -> (s.size.toLong, held,
            BigDecimal(wv).toDouble / held.toDouble))
        }
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: OLS trend slope equals the closed-form exact-rational fold") {
    import org.apache.spark.sql.types.DecimalType
    // the q119 shape: five decomposable sums, (n·Σxy − Σx·Σy) /
    // (n·Σx² − (Σx)²) in DECIMAL(38,0) then ONE double division — vs a
    // BigInt fold; all-same-x groups must yield NULL, not 0/0
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val ptGen = Gen.listOfN(50, for {
      g <- Gen.oneOf("P1", "P2", "P3")
      x <- Gen.chooseNum(0L, 60L)
      y <- Gen.chooseNum(0L, 100000L)
    } yield (g, x, y))
    for (seed <- 1L to 5L) {
      // P3 degenerates to a single x (vertical stack of points)
      val pts = sample(ptGen, seed).map(p => if (p._1 == "P3") p.copy(_2 = 7L) else p)
      val got = pts.toDF("g", "x", "y")
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(d38(col("x")) * d38(col("y"))).as("sxy"),
          sum(d38(col("x")) * d38(col("x"))).as("sxx"))
        .select(col("g"),
          when(d38(col("n")) * col("sxx") - d38(col("sx")) * d38(col("sx")) =!= 0,
            (d38(col("n")) * col("sxy") - d38(col("sx")) * d38(col("sy"))).cast("double") /
              (d38(col("n")) * col("sxx") - d38(col("sx")) * d38(col("sx"))).cast("double"))
            .otherwise(lit(null).cast("double")).as("slope"))
        .as[(String, Option[Double])].collect().toMap
      val want = pts.groupBy(_._1).map { case (g, rs) =>
        val n = BigInt(rs.size)
        val sx = rs.map(r => BigInt(r._2)).sum
        val sy = rs.map(r => BigInt(r._3)).sum
        val sxy = rs.map(r => BigInt(r._2) * BigInt(r._3)).sum
        val sxx = rs.map(r => BigInt(r._2) * BigInt(r._2)).sum
        val den = n * sxx - sx * sx
        g -> (if (den == 0) None
              else Some(BigDecimal(n * sxy - sx * sy).toDouble /
                BigDecimal(den).toDouble))
      }
      assert(got === want, s"seed=$seed")
      assert(got("P3").isEmpty, s"seed=$seed: degenerate group must be NULL")
    }
  }

  test("property: warehouse build is idempotent and FK-complete for any batch") {
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(20, rowGen), seed)
      locally {
        val dir = Files.createTempDirectory("prop_wh").toString
        val csv = (Seq("Descrição,Tipo,Grupo,Categoria,Classificação,Data,Valor") ++
          rows.map { case (d, t, g, c, cl, m, v) => s"""$d,$t,$g,$c,$cl,$m,"$v"""" })
          .mkString("\n")
        Files.writeString(java.nio.file.Paths.get(s"$dir/b.csv"), csv)
        val cat = new Catalog(spark, s"$dir/wh")
        Ingest.run(cat, s"$dir/b.csv")
        val wh = new Warehouse(cat)
        wh.run()
        val afterFirst = cat.table("fato_lancamento").count()
        // distinct hashes == fact rows (merge key invariant)
        val hashes = cat.table("staging_lancamentos")
          .select("id_hash").distinct().count()
        assert(afterFirst === hashes)
        // rerun: nothing changes anywhere
        Ingest.run(cat, s"$dir/b.csv")
        val c2 = wh.run()
        assert(c2.values.sum === 0, s"rerun appended $c2")
        // referential integrity: every fact FK resolves
        cat.registerAll()
        val orphans = spark.sql(
          """SELECT COUNT(*) FROM fato_lancamento f
            |LEFT JOIN dim_tipo t USING (id_tipo)
            |LEFT JOIN dim_grupo g USING (id_grupo)
            |LEFT JOIN dim_categoria c USING (id_categoria)
            |LEFT JOIN dim_classificacao cl USING (id_classificacao)
            |LEFT JOIN dim_tempo tm USING (id_tempo)
            |WHERE t.id_tipo IS NULL OR g.id_grupo IS NULL OR c.id_categoria IS NULL
            |   OR cl.id_classificacao IS NULL OR tm.id_tempo IS NULL""".stripMargin)
          .head().getLong(0)
        assert(orphans === 0L)
      }
    }
  }

  test("property: IncrementalAgg merge of any split equals the one-shot aggregate") {
    import graft.operators.IncrementalAgg
    import graft.operators.IncrementalAgg.AggSpec
    val rowG = for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.option(Gen.chooseNum(-1000, 1000))
    } yield (k, v)
    val aggs = Seq(AggSpec("n", "count", "*"), AggSpec("nv", "count", "v"),
      AggSpec("s", "sum", "v"), AggSpec("mn", "min", "v"), AggSpec("mx", "max", "v"))
    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(60, rowG), seed)
      val cut = sample(Gen.chooseNum(0, rows.length), seed + 100)
      val (r1, r2) = rows.splitAt(cut) // any split point, empty sides included
      val all = rows.toDF("k", "v")
      def part(r: Seq[(String, Option[Int])]) =
        IncrementalAgg.partial(
          if (r.isEmpty) all.limit(0) else r.toDF("k", "v"), Seq("k"), aggs)
      val merged = IncrementalAgg.merge(part(r1), part(r2), Seq("k"), aggs)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val direct = IncrementalAgg.partial(all, Seq("k"), aggs)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(merged === direct, s"seed=$seed cut=$cut")
    }
  }

  test("property: winnowPairs finds any planted shared span in random contexts") {
    import graft.operators.Dedup
    val letters = Gen.listOfN(60, Gen.alphaLowerChar).map(_.mkString)
    for (seed <- 1L to 5L) {
      // span of exactly w+k-1 = 23 chars; contexts are independent
      // random strings (collision-free with the span w.h.p.)
      val span = sample(Gen.listOfN(23, Gen.alphaLowerChar).map(_.mkString), seed)
      val ctx = (1 to 4).map(i => sample(letters, seed * 31 + i))
      val docs = Seq(
        (1L, s"${ctx(0)} $span ${ctx(1)}"),
        (2L, s"${ctx(2)} $span ${ctx(3)}"),
        (3L, sample(letters, seed * 131))).toDF("id", "text")
      val pairs = Dedup.winnowPairs(docs, "id", "text", k = 8, w = 16,
        maxDocFreq = 100).select("a_id", "b_id").as[(Long, Long)].collect()
      assert(pairs.contains((1L, 2L)), s"seed=$seed lost the planted span")
    }
  }

  test("property: lev1Join equals the brute-force edit-distance scan on random strings") {
    import graft.operators.FuzzyJoin
    // tiny alphabet + short strings force shared deletion variants
    // between strings at true distance 2 (the candidates the exact
    // verify must reject) and repeated values (the id re-expansion
    // path); empty strings exercise the degenerate variant
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val strG = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (seed <- 1L to 5L) {
      val ls = sample(Gen.listOfN(15, strG), seed).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val rs = sample(Gen.listOfN(15, strG), seed * 7 + 1).zipWithIndex
        .map { case (s, i) => (i.toLong + 100, s) }
      val got = FuzzyJoin.lev1Join(
        ls.toDF("lid", "s"), rs.toDF("rid", "s"), "lid", "rid", "s")
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (lid, a) <- ls; (rid, b) <- rs
        d = lev(a, b) if d <= 1
      } yield (lid, rid, d)).toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: containmentPairs equals the brute-force pair scan on random corpora") {
    import graft.operators.Dedup
    // small vocabulary forces real overlap, shared shingles, and df
    // filtering; doc lengths straddle the prefix-length boundary cases
    // (1-shingle docs up to ~25-shingle docs)
    val vocab = (0 until 30).map(i => s"w${('a' + i % 26).toChar}${('a' + i / 26).toChar}")
    val docG = Gen.chooseNum(1, 26).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for (seed <- 1L to 5L) {
      val texts = sample(Gen.listOfN(25, docG), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i, t) }
      val got = Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text",
        k = 1, threshold = 0.8, maxDocFreq = 10)
        .as[(Int, Int, Double)].collect().toSet
      val sets0 = docs.map { case (id, t) => id -> t.split(" ").toSet }
      val dfreq = sets0.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      val sets = sets0.map { case (id, s) => id -> s.filter(dfreq(_) <= 10) }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a < b && sa.nonEmpty && sb.nonEmpty
        c = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
        if c >= 0.8
      } yield (a, b, c)).toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: BPE encode reconstructs the tokenized words byte-for-byte") {
    import graft.operators.Bpe
    val textG = Gen.listOfN(12,
      Gen.oneOf(Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString),
        Gen.oneOf("the", "then", "there", "an", "and", "in", "on")))
      .map(_.mkString(" "))
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "n", "i" -> "n", "o" -> "n")
    for (seed <- 1L to 5L) {
      val texts = sample(Gen.listOfN(20, textG), seed)
      val bad = texts.toDF("t").select(
        array_join(Bpe.encode(col("t"), merges), "").as("joined"),
        array_join(graft.functions.TextFunctions.words(col("t")), "").as("raw"))
        .filter(col("joined") =!= col("raw")).count()
      assert(bad === 0L, s"seed=$seed")
    }
  }

  test("property: grouped top-k equals the sorted-take reference on arbitrary multisets") {
    import graft.expressions.TopKStrings
    // small domains force heavy ord ties and duplicate (ord, payload)
    // rows — exactly where a heap with a non-total ordering would
    // diverge from the reference under partition shuffling
    val rowG = for {
      g <- Gen.oneOf("g1", "g2", "g3")
      o <- Gen.chooseNum(0L, 5L)
      p <- Gen.oneOf("a", "b", "c", "d")
    } yield (g, o, p)
    for (seed <- 1L to 8L; k <- Seq(1, 3, 7)) {
      val rows = sample(Gen.listOfN(60, rowG), seed)
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3))
          .sortBy { case (o, p) => (-o, p) }.take(k).map(_._2)
      }
      val got = rows.toDF("g", "o", "p").repartition(5)
        .groupBy(col("g"))
        .agg(TopKStrings.topk(col("o"), col("p"), k).as("top"))
        .as[(String, Seq[String])].collect().toMap
      assert(got === want, s"seed=$seed k=$k")
    }
  }

  test("property: triangle count equals the brute-force closed-wedge scan") {
    import graft.operators.Graph
    // dense-ish small graphs: n ≤ 14 keeps the C(n,3) reference scan
    // trivial while edge probability ~0.4 plants many triangles, degree
    // ties (orientation tie-break on id), isolated vertices, and —
    // because edges are drawn with replacement in both directions —
    // duplicates and loops for `canonical` to collapse
    val edgeG = for {
      a <- Gen.chooseNum(0L, 13L)
      b <- Gen.chooseNum(0L, 13L)
    } yield (a, b)
    for (seed <- 1L to 8L) {
      val raw = sample(Gen.listOfN(40, edgeG), seed)
      val es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a < b }.toSet
      val verts = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
      val want = verts.combinations(3).count {
        case Seq(u, v, w) => es((u, v)) && es((u, w)) && es((v, w))
      }.toLong
      val got = Graph.triangleCount(raw.toDF("x", "y").repartition(5))
        .as[Long].head()
      assert(got === want, s"seed=$seed edges=${es.size}")
    }
  }

  test("property: grid neighbor join equals the brute-force all-pairs scan") {
    import graft.operators.SpatialJoin
    // points denser than the cell size so pairs span same-cell,
    // adjacent-cell, and diagonal-cell cases; duplicates of (x, y)
    // at distinct ids exercise d2 = 0 pairs
    val ptG = for {
      x <- Gen.chooseNum(0L, 120L)
      y <- Gen.chooseNum(0L, 120L)
    } yield (x, y)
    for (seed <- 1L to 6L; r <- Seq(7L, 25L)) {
      val pts = sample(Gen.listOfN(50, ptG), seed).zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
      val got = SpatialJoin.neighborPairs(pts.toDF("id", "x", "y").repartition(5), r)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        a <- pts; b <- pts if a._1 < b._1
        d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
        if d2 <= r * r
      } yield (a._1, b._1, d2)).toSet
      assert(got === want, s"seed=$seed r=$r")
    }
  }

  test("property: integer PageRank equals the sequential exact replay") {
    import graft.operators.Graph
    val edgeG = for {
      a <- Gen.chooseNum(0L, 11L)
      b <- Gen.chooseNum(0L, 11L)
    } yield (a, b)
    val scale = 1000000L
    for (seed <- 1L to 6L) {
      val es = sample(Gen.listOfN(25, edgeG), seed)
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a < b }.distinct
      if (es.nonEmpty) {
        // sequential replay of the exact integer recurrence
        val dir = es ++ es.map { case (a, b) => (b, a) }
        val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val n = deg.size.toLong
        var r = deg.keys.map(_ -> scale / n).toMap
        for (_ <- 1 to 3) {
          val sums = dir.groupBy(_._2).view
            .mapValues(_.map { case (u, _) => r(u) / deg(u) }.sum).toMap
          r = deg.keys.map(p =>
            p -> ((15L * scale) / (100L * n) + 85L * sums.getOrElse(p, 0L) / 100L)).toMap
        }
        val got = Graph.pageRank(es.toDF("a", "b").repartition(4), iters = 3, scale = scale)
          .as[(Long, Long)].collect().toMap
        assert(got === r, s"seed=$seed")
      }
    }
  }
}
