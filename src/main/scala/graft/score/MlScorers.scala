package graft.score

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.model.{Cells, ColumnName, DataRequest, EntityView}

/** MLlib batch-scoring producer (SURVEY §2.2 S21) — the "model producer" of
  * the reference (R7/R10) as a `Transformer.transform` over the stale slice:
  * newest cell values of the input columns assemble into a `features`
  * vector, the model scores set-at-a-time, `predictionCol` becomes the
  * written value. Distributed scoring comes free from MLlib (the model
  * broadcasts with the task closures).
  *
  * Subclasses supply the model (loaded in the constructor or lazily —
  * engine capsules are built once per attachment and reused, mirroring the
  * reference's memoized producer instances).
  */
abstract class MllibScorer extends Scorer {
  /** The trained model/pipeline to apply. */
  def model: Transformer
  /** Input cells; their newest values feed the feature vector, in order. */
  def inputColumns: Seq[ColumnName]
  def predictionCol: String = "prediction"

  override def dataRequest: DataRequest = DataRequest(inputColumns)

  /** Feature value for a missing/empty input cell. Stale rows routinely
    * HAVE empty cells (ShelfLife marks no-value cells stale), and
    * VectorAssembler's default handleInvalid="error" would kill the job on
    * the null — exactly the rows the scorer exists to fill in. */
  def missingValue: Double = 0.0

  override def score(stale: DataFrame, ctx: ScorerContext): DataFrame = {
    val withFeatures = inputColumns.foldLeft(stale) { (df, cn) =>
      df.withColumn(s"__f_${cn.flat}",
        coalesce(Cells.newestValue(col(cn.flat)).cast("double"), lit(missingValue)))
    }
    val assembled = new VectorAssembler()
      .setInputCols(inputColumns.map(cn => s"__f_${cn.flat}").toArray)
      .setOutputCol("features")
      .transform(withFeatures)
    model.transform(assembled)
      .select(col(EntityView.EntityId), col(predictionCol).as("value"))
  }
}

/** Exponentially-decayed version sum: Σ value·2^(−age/halfLife) over ALL
  * versions of a cell — a per-entity aggregate scorer. */
final case class DecayedSum(asOf: Long, halfLifeMs: Long)
  extends Aggregator[(Long, Double), Double, Double] {
  override def zero: Double = 0.0
  override def reduce(acc: Double, v: (Long, Double)): Double =
    acc + v._2 * math.pow(2.0, -((asOf - v._1).toDouble / halfLifeMs))
  override def merge(a: Double, b: Double): Double = a + b
  override def finish(acc: Double): Double = acc
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Aggregator-backed producer (SURVEY §2.2 S19): score = a typed
  * `Aggregator` folded over every (ts, value) version of the attached cell —
  * the shape for custom per-entity aggregate scorers that one Column
  * expression can't express. Registered as a `udaf`, so it runs inside the
  * hash-aggregation operator, partition-parallel. */
abstract class AggScorer(column: ColumnName) extends Scorer {
  /** The per-entity aggregator over (ts, value) versions. */
  def aggregator(ctx: ScorerContext): Aggregator[(Long, Double), _, Double]

  override def dataRequest: DataRequest =
    DataRequest(Seq(column), maxVersions = Int.MaxValue)
  override def outputColumn: ColumnName = column

  /** Score written for a stale entity whose attached cell has no versions —
    * the aggregator's defined value over zero rows. Mirrors MllibScorer's
    * `missingValue`: the producer contract is produce-for-every-stale-row
    * (ShelfLife marks exactly the empty-cell rows stale). */
  def emptyValue: Double = 0.0

  override def score(stale: DataFrame, ctx: ScorerContext): DataFrame = {
    val agg = udaf(aggregator(ctx), Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val aggregated = stale
      .select(col(EntityView.EntityId), explode(col(column.flat)).as("v"))
      .groupBy(EntityView.EntityId)
      .agg(agg(col("v.ts"), col("v.value").cast("double")).as("value"))
    // the inner explode drops NULL/empty cells — exactly the rows ShelfLife
    // marks stale — so rejoin the full stale key set and fill those with
    // the defined empty-cell score
    stale.select(col(EntityView.EntityId))
      .join(aggregated, Seq(EntityView.EntityId), "left")
      .select(col(EntityView.EntityId),
        coalesce(col("value"), lit(emptyValue)).as("value"))
  }
}

/** Stock decayed-sum scorer over the `events` entity view (24 h half-life,
  * clock injected from the scorer context). */
class EventDecayedSum extends AggScorer(ColumnName("events:value")) {
  override def aggregator(ctx: ScorerContext): Aggregator[(Long, Double), _, Double] =
    DecayedSum(ctx.asOf, 86400000L)
}
