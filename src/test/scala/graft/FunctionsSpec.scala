package graft

import graft.functions.{Aggregators, GraftFunctions}
import graft.operators.{SaltedAgg, Similarity}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("Misra-Gries summary honors the n/k guarantee under any partitioning") {
    import spark.implicits._
    val k = 10
    // skewed stream: two true heavy hitters over a 50-token tail;
    // n = 1020, n/k = 102 → "hot" (500) and "warm" (120) qualify
    val words = Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 400).map(i => s"w${i % 50}")
    val n = words.size
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hh = exact.filter { case (_, c) => c * k > n }
    assert(hh.keySet == Set("hot", "warm")) // fixture sanity
    for (parts <- Seq(1, 7, 32)) {
      val m = spark.createDataset(words).repartition(parts)
        .select(new Aggregators.MisraGriesAgg(k).toColumn.name("m"))
        .head()
      assert(m.size <= k - 1, s"summary overflowed at parts=$parts: ${m.size}")
      hh.foreach { case (w, c) =>
        val est = m.get(w)
        assert(est.nonEmpty, s"true heavy hitter '$w' missing at parts=$parts")
        assert(est.get <= c && (c - est.get) * k <= n,
          s"estimate ${est.get} outside [c - n/k, c] for '$w' (c=$c, parts=$parts)")
      }
    }
  }

  test("CMS matrix is partition-layout-independent and never undercounts") {
    import spark.implicits._
    import graft.operators.TextAnalysis.{CmsD, CmsW}
    val words = Seq.fill(300)("hot") ++ Seq.fill(80)("warm") ++
      (0 until 500).map(i => s"w${i % 90}")
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def buckets(w: org.apache.spark.sql.Column) =
      (0 until CmsD).map(i => pmod(hash(w, lit(i)), lit(CmsW)).cast("int"))
    def matrix(parts: Int): Seq[Long] =
      spark.createDataset(words).repartition(parts)
        .select(array(buckets(col("value")): _*).as("bk")).as[Seq[Int]]
        .select(new Aggregators.CmsAgg(CmsD, CmsW).toColumn.name("sk"))
        .head()
    val m1 = matrix(1)
    // merge = element-wise add: the SAME matrix from any layout
    assert(matrix(7) == m1 && matrix(32) == m1)
    assert(m1.sum == CmsD.toLong * words.size) // mass conservation per row
    // point estimates: est >= exact for EVERY word (hard invariant),
    // replayed with the same hash the build used
    val est = spark.createDataset(exact.keys.toSeq)
      .select(col("value").as("word"),
        buckets(col("value")).zipWithIndex.map { case (b, i) =>
          element_at(typedLit(m1), lit(i * CmsW) + b + 1)
        }.reduce(least(_, _)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"CMS undercounted $w: ${est(w)} < $c")
      assert(est(w) - c <= 8L * words.size / CmsW + CmsD,
        s"excess blew the bound for $w: ${est(w)} vs $c")
    }
  }

  test("native cosine matches the declarative zip_with form exactly") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(50)
    val pairs = e.select(col("vec_id").as("ia"), col("v").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("v").as("vb")))
      .filter(col("ia") < col("ib"))
    val decl = pairs.select(col("ia"), col("ib"),
      Similarity.cosine(col("va"), col("vb")).as("c"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val nat = pairs.select(col("ia"), col("ib"),
      GraftFunctions.cosineNative(spark, col("va"), col("vb")).as("c"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(decl.keySet == nat.keySet)
    decl.foreach { case (k, v) =>
      assert(v == nat(k), s"bit mismatch at $k") // same fold order → bit-equal
    }
  }

  test("native cosine via SQL after extension-style registration") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    val z = spark.sql(
      "SELECT graft_cosine(array(0.0d, 0.0d), array(1.0d, 0.0d)) c").head()
    assert(z.isNullAt(0), "zero-norm input must yield NULL")
  }

  test("MinHash Aggregator agrees with itself across partitionings") {
    import spark.implicits._
    val agg = udaf(new Aggregators.MinHashAgg(16))
    val sh = graft.operators.Dedup.shingles(spark, sfDir)
    def sigs(parts: Int) = sh.repartition(parts)
      .groupBy("doc_id").agg(agg(col("shingle")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // merge must be order/partitioning insensitive
    assert(sigs(1) == sigs(7))
  }

  test("MinHash Aggregator form is hash-identical to the expression form") {
    import spark.implicits._
    // the registered LSH path runs through the UDAF; it must produce
    // the same signatures as the 64xmin(xxhash64) expression form
    val expr = graft.operators.Dedup.minhashSignatures(spark, sfDir)
      .as[(Long, Seq[Long])].collect().toMap
    val agg = graft.operators.Dedup.minhashSignaturesAgg(spark, sfDir)
      .as[(Long, Seq[Long])].collect().toMap
    assert(expr.nonEmpty && expr == agg)
  }

  test("md5-family MinHash UDAF is hash-identical to its expression form") {
    import spark.implicits._
    // the oracle-gated LSH path runs through MinHashArithAgg; it must
    // produce the same signatures as declarative Catalyst evaluation
    // of the same (a*g+b) mod p family over the same capped shingles
    val sh = graft.operators.Dedup.cappedShingles(spark, sfDir)
    val expr = graft.operators.Dedup.minhashSignaturesMd5Expr(sh)
      .as[(Long, Seq[Long])].collect().toMap
    val agg = graft.operators.Dedup.minhashSignaturesMd5From(sh)
      .as[(Long, Seq[Long])].collect().toMap
    assert(expr.nonEmpty && expr == agg)
    // merge is order/partitioning insensitive
    val agg7 = graft.operators.Dedup.minhashSignaturesMd5From(
      sh.repartition(7)).as[(Long, Seq[Long])].collect().toMap
    assert(agg == agg7)
  }

  test("Welford aggregator matches built-in avg and var_samp") {
    import spark.implicits._
    val agg = udaf(new Aggregators.WelfordAgg)
    val got = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"))
      .agg(agg(col("l_quantity")).as("mv"))
      .select(col("mv._1").as("mean"), col("mv._2").as("variance"))
      .head()
    val exp = Tables.lineitem(spark, sfDir)
      .agg(avg("l_quantity"), var_samp("l_quantity")).head()
    assert(math.abs(got.getDouble(0) - exp.getDouble(0)) < 1e-9)
    assert(math.abs(got.getDouble(1) - exp.getDouble(1)) < 1e-9)
  }

  test("salted sum equals direct groupBy sum") {
    import spark.implicits._
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .as[(String, Double)].collect().toMap
    val salted = SaltedAgg.sumSalted(Tables.lineitem(spark, sfDir),
      Seq("l_returnflag"), "l_quantity")
      .as[(String, Double)].collect().toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, v) =>
      assert(math.abs(v - salted(k)) < 1e-6, s"mismatch at $k")
    }
  }

  test("salted count-distinct equals countDistinct") {
    import spark.implicits._
    val direct = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority").agg(countDistinct("o_custkey").as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SaltedAgg.countDistinctSalted(Tables.orders(spark, sfDir),
      Seq("o_orderpriority"), "o_custkey")
      .as[(String, Long)].collect().toMap
    assert(direct == salted)
  }

  test("driver-side LSH plane matrix is bit-identical to the md5 expression") {
    // ann_lsh embeds the plane matrix as a literal (40x64 doubles,
    // computed driver-side); the DuckDB oracle re-derives it from md5
    // in SQL. This pins the two constructions to the expression form
    // so neither can drift.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pairs = for (p <- 0 until 40; i <- Seq(0, 1, 31, 63)) yield (p, i)
    val fromExpr = pairs.toDF("p", "i")
      .select(col("p"), col("i"),
        graft.operators.Similarity.planeComponent(col("p"), col("i")).as("c"))
      .as[(Int, Int, Double)].collect()
      .map { case (p, i, c) => (p, i) -> c }.toMap
    pairs.foreach { case (p, i) =>
      assert(fromExpr((p, i)) == graft.operators.Similarity.planeMatrix(p)(i),
        s"plane ($p,$i) drifted")
    }
  }

  test("observed metrics equal the direct aggregates (single-pass profile)") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.FuncOps.observedMetrics(spark, sfDir).head()
    val direct = Tables.lineitem(spark, sfDir).agg(
      count(lit(1)),
      sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")),
      min(col("l_shipdate").cast("date").cast("string")),
      max(col("l_shipdate").cast("date").cast("string"))).head()
    assert(row.getLong(0) == direct.getLong(0))
    assert(row.getLong(1) == direct.getLong(1))
    assert(row.getString(2) == direct.getString(2))
    assert(row.getString(3) == direct.getString(3))
    assert(row.getLong(4) == Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 25).count())
  }
}
