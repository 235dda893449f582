package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SqlApi

/** Round-20 fixes pinned by the round-19 verdict/advice board:
  * the flatten gate's scalar output, the WITH-wrapper ORDER-BY
  * preservation, in-scanner U&'…' decoding, empty-MVD grouping, and the
  * timezone-independent DATE epoch.
  */
class Round20Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q_mvd_array_agg_flatten emits joined scalar strings") {
    spark.sparkContext.setLogLevel("ERROR")
    val df = MvdGates.queries("q_mvd_array_agg_flatten")(spark, "")
    val r = df.collect().head
    assert(r.getString(0) == "x,y,y,null,null")
    assert(r.getString(1) == "null,x,y")
  }

  test("WITH wrapper keeps the outermost ORDER BY over a druid table") {
    val mvMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("druid.mv", true).build()
    spark.sql(
      """SELECT * FROM VALUES ('a', array('x')), ('b', array('y')),
           ('c', array('z')), ('d', CAST(NULL AS ARRAY<STRING>))
         AS t(k, mv)""")
      .withColumn("mv", col("mv").as("mv", mvMeta))
      .createOrReplaceTempView("r20_with_gate")
    graft.functions.MvdTables.register("r20_with_gate")
    val got = SqlApi.runSql(spark,
      """WITH one AS (SELECT 1 AS o)
         SELECT k FROM r20_with_gate ORDER BY k DESC""")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("d", "c", "b", "a"))
    // and a CTE-referencing main query too
    val got2 = SqlApi.runSql(spark,
      """WITH g AS (SELECT k FROM r20_with_gate)
         SELECT k FROM g ORDER BY k DESC""")
      .collect().map(_.getString(0)).toSeq
    assert(got2 == Seq("d", "c", "b", "a"))
  }

  test("U& literals decode in-scanner; ordinary literals with U& survive") {
    import graft.api.SqlApi.{maskLiterals, unmaskLiterals}
    val (m1, l1) = maskLiterals("SELECT U&'\\0025' AS p")
    assert(unmaskLiterals(m1, l1) == "SELECT '%' AS p")
    // the r19 pre-pass regex hazard: a plain literal containing "U&"
    // must not open a unicode literal spanning literal boundaries
    val hazard = "WHERE a = 'PU&' AND b = 'x'"
    val (m2, l2) = maskLiterals(hazard)
    assert(unmaskLiterals(m2, l2) == hazard)
    // a decoded quote re-escapes so the literal stays well-formed
    val (m3, l3) = maskLiterals("SELECT U&'a\\0027b'")
    assert(unmaskLiterals(m3, l3) == "SELECT 'a''b'")
    // backslash escape and lowercase u&
    val (m4, l4) = maskLiterals("SELECT u&'x\\\\y'")
    assert(unmaskLiterals(m4, l4) == "SELECT 'x\\y'")
  }

  test("empty MVD arrays group into the null group") {
    val mvMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("druid.mv", true).build()
    spark.sql(
      """SELECT * FROM VALUES
           ('a', array('x', 'y')), ('b', array()),
           ('c', CAST(NULL AS ARRAY<STRING>))
         AS t(k, mv)""")
      .withColumn("mv", col("mv").cast("array<string>").as("mv", mvMeta))
      .createOrReplaceTempView("r20_empty_gate")
    graft.functions.MvdTables.register("r20_empty_gate")
    val got = SqlApi.runSql(spark,
      """SELECT mv AS e, CAST(count(*) AS BIGINT) AS n
         FROM r20_empty_gate GROUP BY 1 ORDER BY e NULLS FIRST""")
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"),
        r.getLong(1)))
      .toSeq
    // the empty-array row 'b' and the null row 'c' BOTH land in the null
    // group (Druid's groupBy engine) — explode must not drop row 'b'
    assert(got == Seq(("<null>", 2L), ("x", 1L), ("y", 1L)))
  }

  test("functions over two MVDs apply to the cartesian element product") {
    val mvMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("druid.mv", true).build()
    spark.sql(
      """SELECT * FROM VALUES
           ('r1', array('a'), array('a', 'b'), 'z1'),
           ('r2', CAST(NULL AS ARRAY<STRING>), array('b', 'c'), 'z2'),
           ('r3', CAST(NULL AS ARRAY<STRING>), CAST(NULL AS ARRAY<STRING>),
            'z3')
         AS t(k, mva, mvb, s)""")
      .withColumn("mva", col("mva").as("mva", mvMeta))
      .withColumn("mvb", col("mvb").as("mvb", mvMeta))
      .createOrReplaceTempView("r20_cart_gate")
    graft.functions.MvdTables.register("r20_cart_gate")
    // COALESCE(mva, mvb, s): r1 maps over mva×mvb (coalesce short-
    // circuits per pair → ['a','a']); r2's null mva fills from mvb; r3
    // falls through to the scalar (CalciteQueryTest
    // testCoalesceMoreColumns: the 'a' group counts BOTH r1 cells)
    val got = SqlApi.runSql(spark,
      """SELECT COALESCE(mva, mvb, s) AS e, CAST(count(*) AS BIGINT) AS n
         FROM r20_cart_gate GROUP BY 1 ORDER BY e""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L), ("c", 1L), ("z3", 1L)))
  }

  test("TIME_FLOOR calendar period with explicit origin") {
    val got = SqlApi.runSql(spark,
      """SELECT CAST(TIME_FLOOR(TIMESTAMP'2000-01-01 00:00:00', 'P1M',
                       TIMESTAMP '1970-01-01 01:02:03') AS STRING) AS a,
                CAST(TIME_FLOOR(TIMESTAMP'2000-01-02 10:00:00', 'P1M',
                       TIMESTAMP '1970-01-01 01:02:03') AS STRING) AS b""")
      .collect().head
    assert(got.getString(0) == "1999-12-01 01:02:03")
    assert(got.getString(1) == "2000-01-01 01:02:03")
  }

  test("inline UNNEST as the sole table factor") {
    val got = SqlApi.runSql(spark,
      "SELECT COUNT(*) AS n FROM (select c from UNNEST(ARRAY[1,2,3]) as u(c))")
      .collect().head.getLong(0)
    assert(got == 3L)
  }

  test("EXTRACT(EPOCH FROM DATE) is timezone-independent") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val e = SqlApi.runSql(spark,
        "SELECT EXTRACT(EPOCH FROM DATE '1970-01-02') AS e")
        .collect().head.getLong(0)
      assert(e == 86400L, s"DATE epoch shifted by the session zone: $e")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
