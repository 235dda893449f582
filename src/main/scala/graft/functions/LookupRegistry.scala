package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Coalesce, ElementAt, Expression, Literal}
import org.apache.spark.sql.types.{MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Named lookup tables (reference: the lookup framework —
  * `query/LookupDataSource.java:38`, `LookupExprMacro.java`, introspected via
  * the lookup schema). A lookup is a bounded key→value map registered under a
  * name; `LOOKUP(expr, 'name'[, replaceMissing])` resolves at plan time to a
  * map literal, which Spark ships to executors with the task binary — the
  * exact analog of the reference broadcasting lookup snapshots to every node.
  */
object LookupRegistry {
  private val lookups = TrieMap[String, Map[String, String]]()

  def register(name: String, mapping: Map[String, String]): Unit =
    lookups.put(name, mapping)

  def get(name: String): Option[Map[String, String]] = lookups.get(name)
  def names: Seq[String] = lookups.keys.toSeq.sorted

  /** Default cap on loaded-lookup cardinality. The reference's cached
    * global lookups (`lookups-cached-global`, JDBC/URI loaders) are
    * heap-resident maps replicated to every node — a lookup that does not
    * comfortably fit the driver/executor heap is a modeling error, so
    * loading is guarded rather than silently OOMing a 1000-executor fleet.
    */
  val MaxLoadedEntries: Int = 1000000

  /** Load a lookup from any two-column DataFrame source — the analog of the
    * reference's JDBC / URI lookup loaders (`lookups-cached-global`
    * JdbcExtractionNamespace / UriExtractionNamespace): first column key,
    * second value, both cast to string; duplicate keys keep the LAST value
    * seen, matching the reference's replace-on-reload semantics.
    */
  def registerFrom(name: String, df: org.apache.spark.sql.DataFrame,
                   keyCol: String, valueCol: String,
                   maxEntries: Int = MaxLoadedEntries): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(col(keyCol).cast("string"), col(valueCol).cast("string"))
      .limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"lookup '$name' exceeds $maxEntries entries; load a smaller projection " +
        "or raise maxEntries explicitly")
    register(name, rows.iterator
      .filter(r => !r.isNullAt(0))
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap)
  }

  /** Expression builder for SQL `LOOKUP(expr, 'name'[, 'replaceMissing'])`. */
  def lookupBuilder(args: Seq[Expression]): Expression = {
    require(args.size >= 2, "LOOKUP(expr, 'name'[, replaceMissing])")
    val name = args(1) match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"LOOKUP name must be a string literal, got $other")
    }
    val mapping = lookups.getOrElse(name,
      throw new IllegalArgumentException(s"unknown lookup: $name"))
    // raw Catalyst nodes (a Column-node wrapper would not survive codegen
    // when spliced into a parsed SQL tree)
    val mapLit = Literal.create(mapping, MapType(StringType, StringType))
    val hit = ElementAt(mapLit, args.head)
    if (args.size > 2) Coalesce(Seq(hit, args(2))) else hit
  }

  /** Register the SQL function on a session. */
  def registerSql(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("lookup", lookupBuilder, "built-in")
}
