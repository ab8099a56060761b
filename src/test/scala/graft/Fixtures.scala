package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{Cells, ColumnName, DataRequest}
import graft.policy.{AlwaysFreshen, FreshnessPolicy, NewerThan}
import graft.score.{ExprScorer, IncrementScorer, KvLookupScorer, Scorer, ScorerContext}

/** In-memory versions of the reference test fixtures (FIXTURES.md; layouts
  * from `src/test/java/org/kiji/scoring/impl/TestInternalFreshKijiTableReader.java:200-217`,
  * `src/test/java/org/kiji/scoring/TestFreshnessDemo.java:67,86-95`,
  * `src/test/java/org/kiji/scoring/TestKijiFreshnessManager.java:86-99`). */
object Fixtures {
  case class SCell(ts: Long, value: String)
  case class LCell(ts: Long, value: Long)
  case class ICell(ts: Long, value: Int)

  case class RowData(entity_id: String,
      family_qual0: Seq[SCell], family_qual1: Seq[SCell], family_qual2: Seq[SCell],
      map: Map[String, Seq[ICell]])

  /** ROW_DATA_TEST (engine tests). */
  def rowDataTest(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      RowData("foo", Seq(SCell(5, "foo-val")), Seq(SCell(5, "foo-val")),
        Seq(SCell(5, "foo@val.com")), Map("qualifier" -> Seq(ICell(5, 1)))),
      RowData("bar", Seq(SCell(5, "bar-val")), Seq(),
        Seq(SCell(5, "bar@val.com")), Map.empty)
    ).toDS.toDF
  }

  case class UserRow(entity_id: String, info_name: Seq[SCell], info_visits: Seq[LCell])

  /** COUNTER_TEST (`user` demo table): foo's visits=(ts 1, 10). */
  def userCounter(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      UserRow("foo", Seq(SCell(5, "foo-val")), Seq(LCell(1, 10))),
      UserRow("bar", Seq(SCell(1, "bar-val")), Seq(LCell(5, 100)))
    ).toDS.toDF
  }

  case class RegistryUserRow(entity_id: String, info_name: Seq[SCell],
      info_email: Seq[SCell], networks: Map[String, Seq[SCell]])

  /** USER_TABLE (registry/validation tests). */
  def userRegistry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      RegistryUserRow("foo", Seq(SCell(5, "foo-val")), Seq(SCell(5, "foo@bar.org")), Map.empty),
      RegistryUserRow("bar", Seq(SCell(5, "bar-val")), Seq(SCell(5, "bar@foo.org")), Map.empty)
    ).toDS.toDF
  }
}

// ---- test scorers/policies (top-level: loaded reflectively by class name,
// ---- mirroring `impl/InternalFreshKijiTableReader.java:319-345`) ----

/** Demo producer: visits+1 (`TestFreshnessDemo.java:56-59`). */
class VisitsIncrement extends IncrementScorer(ColumnName.qualified("info", "visits"))

/** Rewrite producer: constant 'new-val' on family:qual0
  * (`TestInternalFreshKijiTableReader.java:86-89,407-431`). */
class QualRewrite extends ExprScorer {
  override def dataRequest: DataRequest = DataRequest(Seq(ColumnName("family:qual0")))
  override def outputColumn: ColumnName = ColumnName("family:qual0")
  override def scoreExpr(ctx: ScorerContext) = org.apache.spark.sql.functions.lit("new-val")
}

/** Constant producer attached to info_name in the user table. */
class NameRewrite extends ExprScorer {
  override def dataRequest: DataRequest = DataRequest(Seq(ColumnName("info:name")))
  override def outputColumn: ColumnName = ColumnName("info:name")
  override def scoreExpr(ctx: ScorerContext) = org.apache.spark.sql.functions.lit("scored")
}

/** Map-family counter: every present qualifier gets value+1
  * (`TestInternalFreshKijiTableReader.java:125-135`). */
class MapIncrement extends Scorer {
  import org.apache.spark.sql.functions._
  override def dataRequest: DataRequest = DataRequest(Seq(ColumnName("map", None)))
  override def outputColumn: ColumnName = ColumnName("map", None)
  override def score(stale: DataFrame, ctx: ScorerContext): DataFrame =
    stale.select(col("entity_id"), explode(col("map")).as(Seq("qualifier", "cell")))
      .select(col("entity_id"), col("qualifier"),
        (coalesce(Cells.newestValue(col("cell")), lit(0)) + lit(1)).as("value"))
}

/** KV-join producer (`TestKVStores.java:85-92`): species = cats[name]. */
class CatsLookup extends KvLookupScorer(
  ColumnName.qualified("info", "name"), "cats", "producer-src",
  ColumnName.qualified("info", "email"))

/** Policy that binds the same store name as [[CatsLookup]] — policy binding
  * shadows the producer's (`TestKVStores.java:244-262`). */
class ShadowingPolicy extends FreshnessPolicy {
  override def isFresh(cell: org.apache.spark.sql.Column, asOf: Long) =
    org.apache.spark.sql.functions.lit(false)
  override def storeBindings: Map[String, String] = Map("cats" -> "policy-src")
}

/** Policy with its OWN data request (R23,
  * `test/impl/TestInternalFreshKijiTableReader.java:150-167`): freshness is
  * judged by info:name's newest timestamp, not by the attached column. */
class NameGatedPolicy extends FreshnessPolicy {
  override def ownRequest: Option[DataRequest] =
    Some(DataRequest(Seq(ColumnName.qualified("info", "name"))))
  override def isFresh(cell: org.apache.spark.sql.Column, asOf: Long) =
    Cells.hasValues(cell) && Cells.newestTs(cell) >= org.apache.spark.sql.functions.lit(3L)
}

/** Producer whose data request names a missing column (validation R15). */
class BadRequestScorer extends ExprScorer {
  override def dataRequest: DataRequest = DataRequest(Seq(ColumnName("info:absent")))
  override def outputColumn: ColumnName = ColumnName("info:name")
  override def scoreExpr(ctx: ScorerContext) = org.apache.spark.sql.functions.lit("x")
}

/** Producer declaring a different qualified output than its attachment (R15). */
class WrongOutputScorer extends ExprScorer {
  override def dataRequest: DataRequest = DataRequest(Seq(ColumnName("info:name")))
  override def outputColumn: ColumnName = ColumnName("info:email")
  override def scoreExpr(ctx: ScorerContext) = org.apache.spark.sql.functions.lit("x")
}
