package graft

import graft.operators.SqlSurface
import org.apache.spark.sql.functions._

/** Spark 4 SQL-surface rungs: SQL UDF / SQL table function (bodies
  * inline into the plan — no closure lane), pipe syntax (sugar for
  * the same plan), and collations (case-insensitivity as a type
  * property). Each is pinned against an independent equivalent. */
class SqlSurfaceSpec extends SparkSpec {

  test("sql_udf: nested SQL UDFs inline — no closure UDF in the plan") {
    val df = SqlSurface.sqlUdf(spark, sfDir)
    val rows = df.collect()
    // the function body became expression tree, not a black-box UDF
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"SQL UDF left a closure node:\n$plan")
    // equal to the hand-inlined DataFrame twin
    val netC = expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)")
    val twin = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(netC).as("net_cents"),
        sum(expr("CAST(round(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) * (1 + l_tax)) AS BIGINT)")).as("taxed_cents"))
      .orderBy("l_returnflag")
    assert(rows.toSeq == twin.collect().toSeq)
  }

  test("sql_tvf: the table function is the parameterized subquery") {
    val out = SqlSurface.sqlTvf(spark, sfDir).head()
    val exp = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
        countDistinct("o_custkey")).head()
    assert(out == exp)
  }

  test("sql_pipe lowers to the same answer as the nested form") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    val piped = SqlSurface.sqlPipe(spark, sfDir).collect()
    val nested = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) AS sum_cents
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY 1, 2 HAVING count(*) > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    assert(piped.toSeq == nested.toSeq)
  }

  test("collation_ops: UTF8_LCASE distinct/equality vs independent recount") {
    import spark.implicits._
    val row = SqlSurface.collationOps(spark, sfDir).head()
    val toks = Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).as("t"))
      .as[String].collect()
    assert(row.getLong(0) == toks.map(_.toLowerCase).distinct.length.toLong)
    assert(row.getLong(1) == toks.distinct.length.toLong)
    assert(row.getLong(2) == toks.count(_.toLowerCase == "the").toLong)
    // crafted mixed-case corpus: the collation must actually merge
    // case variants (the sf0.001 corpus happens to be case-collision
    // free, which would prove nothing)
    Seq("Foo foo FOO bar", "The THE the bar Bar")
      .toDF("text").createOrReplaceTempView("documents")
    val crafted = SqlSurface.collationBody(spark).head()
    assert(crafted.getLong(0) == 3L, "ci distinct: foo, bar, the")
    assert(crafted.getLong(1) == 8L, "cs distinct keeps every variant")
    assert(crafted.getLong(2) == 3L, "The/THE/the all equal 'the' under UTF8_LCASE")
  }
}
