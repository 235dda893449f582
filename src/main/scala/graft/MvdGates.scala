package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Driver gates for the Druid MULTI-VALUE DIMENSION dialect (round 18):
  * grouping on an MVD explodes per element, scalar string functions map
  * per element, a null MVD row is the single-null MV for the
  * CONTAINS/OVERLAP family, numeric-aggregate ORDER BY places NULL as
  * the largest value with dimension-order ties, CAST(string AS integral)
  * parses leniently through the double space, and STRING_AGG(DISTINCT)
  * emits the sorted distinct set. Reference behavior pinned by the
  * Calcite QueryTest grids (CalciteMultiValueStringQueryTest,
  * CalciteQueryTest testOrderByAny / testSumOfString / testStringAgg).
  *
  * The fixture is registered per call: a druid.mv-tagged MV column (the
  * MVD convention the engine's dialect keys on) over a 4-row table.
  */
object MvdGates {

  private def fixture(s: SparkSession): Unit = {
    val mvMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("druid.mv", true).build()
    s.sql(
      """SELECT * FROM VALUES
           ('a', array('x', 'y'), 1L),
           ('b', array('y'), CAST(NULL AS BIGINT)),
           ('c', CAST(NULL AS ARRAY<STRING>), 2L),
           ('d', CAST(NULL AS ARRAY<STRING>), CAST(NULL AS BIGINT))
         AS t(k, mv, v)""")
      .withColumn("mv", col("mv").as("mv", mvMeta))
      .orderBy("k").coalesce(1)
      .createOrReplaceTempView("mvd_gate")
    graft.functions.MvdTables.register("mvd_gate")
    graft.functions.DruidFunctions.register(s)
    GraftExtensions.register(s)
  }

  private def run(s: SparkSession, sql: String): DataFrame = {
    fixture(s)
    api.SqlApi.runSql(s, sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // grouping by an MVD expression explodes per element; null rows land
    // in the null group; ties in ORDER BY agg list in dimension order
    "q_mvd_groupby_explode" -> ((s, _) => run(s,
      """SELECT MV_APPEND(mv, 'z') AS e, CAST(count(*) AS BIGINT) AS n
         FROM mvd_gate GROUP BY 1 ORDER BY 2 DESC, 1""")),
    // scalar string fns map per element; a null MVD row applies once with
    // the null scalar (null result = SQL NULL); MV_CONTAINS(mv, [NULL])
    // finds the null MVD rows (null row IS the single-null MV)
    "q_mvd_elementwise_fns" -> ((s, _) => run(s,
      """SELECT k, MV_TO_STRING(COALESCE(mv, k), ',') AS c1,
                MV_TO_STRING(CONCAT(mv, '!'), ',') AS c2,
                MV_CONTAINS(mv, ARRAY[NULL]) AS hasnull
         FROM mvd_gate ORDER BY k""")),
    // numeric-aggregate sort keys place NULL as the LARGEST value
    // (nulls last ascending), ties resolve in dimension order
    "q_mvd_order_nulls_high" -> ((s, _) => run(s,
      """SELECT k, ANY_VALUE(v) AS av FROM mvd_gate
         GROUP BY 1 ORDER BY 2 LIMIT 10""")),
    // CAST(string AS integral) parses leniently through the double space
    // ('10.1' -> 10, non-numeric -> NULL — ExprEval convention), and
    // STRING_AGG(DISTINCT ...) is the sorted distinct set
    "q_mvd_lenient_cast_stragg" -> ((s, _) => run(s,
      """SELECT CAST('10.1' AS BIGINT) AS a,
                CAST(CAST('7' AS INTEGER) AS BIGINT) AS b,
                CAST('zap' AS BIGINT) AS c,
                SUM(CAST(k AS INTEGER)) AS d,
                STRING_AGG(DISTINCT k, ',') AS e
         FROM mvd_gate""")))

  val oracleSql: Map[String, String] = Map(
    "q_mvd_groupby_explode" ->
      """WITH t(k, mv, v) AS (VALUES
           ('a', ['x','y'], 1), ('b', ['y'], NULL),
           ('c', NULL, 2), ('d', NULL, NULL))
         SELECT e, count(*) AS n
         FROM (SELECT unnest(CASE WHEN mv IS NULL THEN [NULL]
                 ELSE list_append(mv, 'z') END) AS e FROM t)
         GROUP BY e ORDER BY n DESC, e ASC NULLS FIRST""",
    "q_mvd_elementwise_fns" ->
      """WITH t(k, mv, v) AS (VALUES
           ('a', ['x','y'], 1), ('b', ['y'], NULL),
           ('c', NULL, 2), ('d', NULL, NULL))
         SELECT k,
                CASE WHEN mv IS NULL THEN k
                     ELSE array_to_string(mv, ',') END AS c1,
                CASE WHEN mv IS NULL THEN NULL
                     ELSE array_to_string(
                       list_transform(mv, ge -> ge || '!'), ',') END AS c2,
                (mv IS NULL) AS hasnull
         FROM t ORDER BY k""",
    "q_mvd_order_nulls_high" ->
      """WITH t(k, mv, v) AS (VALUES
           ('a', ['x','y'], 1::BIGINT), ('b', ['y'], NULL),
           ('c', NULL, 2::BIGINT), ('d', NULL, NULL))
         SELECT k, v AS av FROM t
         ORDER BY av ASC NULLS LAST, k LIMIT 10""",
    "q_mvd_lenient_cast_stragg" ->
      """SELECT 10::BIGINT AS a, 7::BIGINT AS b, NULL::BIGINT AS c,
                NULL::BIGINT AS d, 'a,b,c,d' AS e""")
}
