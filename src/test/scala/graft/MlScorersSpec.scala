package graft

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnName, DataRequest}
import graft.score.{EventDecayedSum, EventValueIncrement, EventValueRescale, MllibScorer, ScorerContext}

/** MLlib model scorer over a feature cell. Train-once on y=2x (exact fit). */
class DoubleItScorer extends MllibScorer {
  override lazy val model: Transformer = {
    val spark = SparkSpec.session
    import spark.implicits._
    val train = new VectorAssembler().setInputCols(Array("x")).setOutputCol("features")
      .transform(Seq((0.0, 0.0), (1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y"))
    new LinearRegression().setLabelCol("y").setMaxIter(10).fit(train)
  }
  override def inputColumns: Seq[ColumnName] = Seq(ColumnName("feat:x"))
  override def outputColumn: ColumnName = ColumnName("score:value")
}

class MlScorersSpec extends AnyFunSuite with SparkSpec {

  test("MllibScorer: assembles newest cell values and scores with the model") {
    import spark.implicits._
    val view = Seq(
      ("e1", Seq((5L, 10.0))),
      ("e2", Seq((9L, 3.0), (5L, 100.0)))) // newest value 3.0 wins
      .toDF("entity_id", "feat_x")
      .withColumn("feat_x", expr("transform(feat_x, v -> named_struct('ts', v._1, 'value', v._2))"))
    val out = new DoubleItScorer().score(view, ScorerContext(0L, Map.empty))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("e1") - 20.0) < 1e-6)
    assert(math.abs(out("e2") - 6.0) < 1e-6)
  }

  test("AggScorer: decayed sum folds every version with the injected clock") {
    import spark.implicits._
    val halfLife = 86400000L
    val asOf = 2 * halfLife
    val view = Seq(
      ("e1", Seq((asOf, 8.0), (asOf - halfLife, 4.0))), // 8·2^0 + 4·2^-1 = 10
      ("e2", Seq((asOf - 2 * halfLife, 12.0))))         // 12·2^-2 = 3
      .toDF("entity_id", "events_value")
      .withColumn("events_value",
        expr("transform(events_value, v -> named_struct('ts', v._1, 'value', v._2))"))
    val out = new EventDecayedSum().score(view, ScorerContext(asOf, Map.empty))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("e1") - 10.0) < 1e-9)
    assert(math.abs(out("e2") - 3.0) < 1e-9)
  }

  test("EventValueRescale: challenger scores newest × 0.9 + 1; shadow delta vs champion") {
    import spark.implicits._
    // cells kept sorted newest-first, per the Cells contract
    val view = Seq(("e1", Seq((2L, 20.0), (1L, 10.0))), ("e2", Seq((1L, 2.0))))
      .toDF("entity_id", "events_value")
      .withColumn("events_value",
        expr("transform(events_value, v -> named_struct('ts', v._1, 'value', v._2))"))
    val ctx = ScorerContext(5L, Map.empty)
    val challenger = new EventValueRescale().score(view, ctx)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(challenger("e1") - 19.0) < 1e-12) // 20·0.9 + 1
    assert(math.abs(challenger("e2") - 2.8) < 1e-12)  // 2·0.9 + 1
    // shadow disagreement against the champion (newest + 1): |Δ| = 0.1·v
    val champion = new EventValueIncrement().score(view, ctx)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(champion("e1") - challenger("e1")) > 0.5)  // v=20 disagrees
    assert(math.abs(champion("e2") - challenger("e2")) <= 0.5) // v=2 agrees
  }

  test("AggScorer: NULL/empty stale cells still receive a score (emptyValue)") {
    import spark.implicits._
    // empty and NULL cells are exactly what ShelfLife marks stale — the
    // producer contract says every stale row gets a score, so the inner
    // explode must not drop them
    val view = Seq(
      ("e1", Seq((5L, 8.0))),
      ("e2", Seq.empty[(Long, Double)]))
      .toDF("entity_id", "events_value")
      .withColumn("events_value",
        expr("transform(events_value, v -> named_struct('ts', v._1, 'value', v._2))"))
      .withColumn("events_value",
        when(col("entity_id") === "e2", lit(null)).otherwise(col("events_value")))
      .union(Seq(("e3", Seq.empty[(Long, Double)])).toDF("entity_id", "events_value")
        .withColumn("events_value",
          expr("transform(events_value, v -> named_struct('ts', v._1, 'value', v._2))")))
    val out = new EventDecayedSum().score(view, ScorerContext(5L, Map.empty))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("e1", "e2", "e3"))
    assert(math.abs(out("e1") - 8.0) < 1e-9)
    assert(out("e2") == 0.0 && out("e3") == 0.0)
  }
}
