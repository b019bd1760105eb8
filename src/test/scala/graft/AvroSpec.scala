package graft

import org.apache.spark.sql.functions.col

/** The avro-mapred-backed Avro source/sink ([[graft.sources.AvroIO]]):
  * row-level value survival (the oracle gates only aggregates), write
  * parallelism, and reader-schema evolution semantics. */
class AvroSpec extends SparkSpec {

  test("avro roundtrip: every row survives bit-exact, one container " +
    "file per write partition") {
    val dir = Scratch.processScoped("graft_avro_spec", "li").toString
    graft.sources.AvroIO.writeAvro(spark, sfDir, dir)
    val back = graft.sources.AvroIO.readAvro(spark, dir)
    val src = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    // multiset equality, both directions (exceptAll is bag semantics)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0, "avro read invented rows")
    assert(src.exceptAll(back).count() == 0, "avro read lost rows")
    // the write is one container file per partition — the
    // embarrassingly-parallel sink shape (no single-writer funnel)
    val files = Option(new java.io.File(dir).listFiles()).fold(0)(
      _.count(_.getName.endsWith(".avro")))
    assert(files == src.rdd.getNumPartitions,
      s"$files container files for ${src.rdd.getNumPartitions} partitions")
  }

  test("avro evolution: reader default fills every legacy row, row " +
    "mass survives the dropped column") {
    val out = graft.sources.AvroIO.avroEvolution(spark, sfDir).collect()
    val n = Tables.lineitem(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == n, "row mass changed under evolution")
    out.foreach { r =>
      assert(r.getLong(2) == 7L && r.getLong(3) == 7L,
        s"reader default not applied: $r")
    }
  }

  test("avro logical types: decimal cents exact to the source, " +
    "timestamp micros exact, evolution widens precision + defaults") {
    import org.apache.spark.sql.functions._
    val out = graft.sources.AvroIO.avroDecimal(spark, sfDir).collect()
    val src = Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"),
        min(unix_micros(col("o_orderdate").cast("timestamp"))).as("ts_min"),
        max(unix_micros(col("o_orderdate").cast("timestamp"))).as("ts_max"))
      .orderBy("yr").collect()
    assert(out.length == src.length && out.nonEmpty)
    out.zip(src).foreach { case (a, b) =>
      // cents equality is the decimal-bytes exactness proof: any
      // binary-float detour in the mapping drifts the sum
      assert(a.getInt(0) == b.getInt(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) && a.getLong(3) == b.getLong(3) &&
        a.getLong(4) == b.getLong(4), s"logical-type drift: $a vs $b")
    }
    val ev = graft.sources.AvroIO.avroDecimalEvolution(spark, sfDir).head()
    val totalN = src.map(_.getLong(1)).sum
    val totalCents = src.map(_.getLong(2)).sum
    assert(ev.getLong(0) == totalN, "row mass changed under evolution")
    assert(ev.getLong(1) == totalCents,
      "decimal sum drifted under widened precision")
    assert(ev.getLong(2) == 25L && ev.getLong(3) == 25L,
      s"reader default not applied: $ev")
  }
}
