package graft.policy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Cells, ColumnName, DataRequest}

/** Freshness policy SPI — the Spark re-expression of `KijiFreshnessPolicy`
  * (reference: `src/main/java/org/kiji/scoring/KijiFreshnessPolicy.java:66-103`).
  *
  * The reference's per-row `isFresh(KijiRowData, PolicyContext): Boolean`
  * becomes a Boolean `Column` predicate evaluated set-at-a-time over the table
  * slice; the wall clock is always an injected `asOf` epoch-millis literal so
  * batch runs are deterministic (SURVEY §7 hard parts).
  *
  * Implementations must have a no-arg constructor (they are instantiated
  * reflectively from registry class names, mirroring
  * `impl/InternalFreshKijiTableReader.java:319-327`) and round-trip their
  * configuration through `serialize`/`deserialize`.
  */
trait FreshnessPolicy extends Serializable {
  /** Boolean predicate: true ⇒ the stored value is fresh, skip scoring. */
  def isFresh(cell: Column, asOf: Long): Column

  /** When Some, the policy evaluates against its own request rather than the
    * client's (reference: `KijiFreshnessPolicy.java:74-84`,
    * `shouldUseClientDataRequest`). In Spark the whole row is available, so
    * this only affects which columns the engine must retain in the slice. */
  def ownRequest: Option[DataRequest] = None

  /** Full own-request form (R23): when [[ownRequest]] is defined the engine
    * resolves EVERY requested column's cell (in request order) and calls
    * this — the analogue of the reference feeding the policy the complete
    * row data of its own request
    * (`impl/InternalFreshKijiTableReader.java:588-617`). The default
    * delegates to the single-cell [[isFresh]] on the first requested
    * column, so single-column policies are unchanged. */
  def isFreshCells(cells: Seq[(ColumnName, Column)], asOf: Long): Column =
    isFresh(cells.head._2, asOf)

  /** Serialized configuration state (JSON, like the stock reference policies:
    * `lib/ShelfLife.java:115-125`). */
  def serialize(): String = ""
  def deserialize(state: String): Unit = ()

  /** Key-value stores this policy binds (store name → source key). Policy
    * bindings SHADOW producer bindings of the same name
    * (reference: `impl/InternalFreshKijiTableReader.java:374-379`,
    * masking test `src/test/java/org/kiji/scoring/TestKVStores.java:244-262`). */
  def storeBindings: Map[String, String] = Map.empty
}

object FreshnessPolicy {
  /** Reflective load from a registry record
    * (reference: `impl/InternalFreshKijiTableReader.java:319-327,367`). */
  def load(className: String, state: String): FreshnessPolicy = {
    val p = Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[FreshnessPolicy]
    p.deserialize(state)
    p
  }

  private val IntRe = """\{"(\w+)":(-?\d+)\}""".r
  /** Single-field integer JSON state used by the stock policies. */
  private[policy] def readLongField(state: String, field: String): Long = state match {
    case IntRe(f, v) if f == field => v.toLong
    case other => throw new IllegalArgumentException(
      s"Cannot deserialize policy state '$other' (expected {\"$field\":<long>})")
  }
  private[policy] def writeLongField(field: String, v: Long): String =
    s"""{"$field":$v}"""
}

/** Always stale ⇒ always score (reference: `src/main/java/org/kiji/scoring/lib/AlwaysFreshen.java:41-43`). */
final class AlwaysFreshen extends FreshnessPolicy {
  override def isFresh(cell: Column, asOf: Long): Column = lit(false)
}

/** Always fresh ⇒ never score (reference: `src/main/java/org/kiji/scoring/lib/NeverFreshen.java:40-42`). */
final class NeverFreshen extends FreshnessPolicy {
  override def isFresh(cell: Column, asOf: Long): Column = lit(true)
}

/** Fresh ⇔ the column has values and the newest version is no older than
  * `shelfLifeMs` relative to the injected `asOf` clock
  * (reference: `src/main/java/org/kiji/scoring/lib/ShelfLife.java:78-97`;
  * wall clock at `:96` replaced by `asOf`). Missing column/values ⇒ stale.
  */
final class ShelfLife(var shelfLifeMs: Long) extends FreshnessPolicy {
  def this() = this(-1L)
  override def isFresh(cell: Column, asOf: Long): Column =
    Cells.hasValues(cell) && (lit(asOf) - Cells.newestTs(cell)) <= lit(shelfLifeMs)
  override def serialize(): String = FreshnessPolicy.writeLongField("shelfLife", shelfLifeMs)
  override def deserialize(state: String): Unit =
    shelfLifeMs = FreshnessPolicy.readLongField(state, "shelfLife")
}

/** Cross-column freshness — the R23 FULL own-request form: fresh ⇔ the
  * newest version of `colA` is at least as new as the newest version of
  * `colB`, where BOTH columns come from the policy's own request and
  * neither needs to be the attachment point. The canonical use: re-score a
  * derived column when activity (`colB`, e.g. clicks) arrived after the
  * last conversion (`colA`, e.g. purchases). A missing/empty column ranks
  * oldest, so "activity but no conversion yet" is stale and "no activity"
  * is fresh. Exercises the engine path mirroring
  * `impl/InternalFreshKijiTableReader.java:588-617`, where the policy's
  * own request is issued separately and its full row data fed to isFresh —
  * inexpressible in the single-cell form. */
final class NewerDependency(var colA: String, var colB: String) extends FreshnessPolicy {
  def this() = this("", "")
  override def ownRequest: Option[DataRequest] =
    Some(DataRequest(Seq(ColumnName(colA), ColumnName(colB))))
  override def isFresh(cell: Column, asOf: Long): Column =
    throw new UnsupportedOperationException(
      "NewerDependency correlates two columns; the engine calls isFreshCells")
  override def isFreshCells(cells: Seq[(ColumnName, Column)], asOf: Long): Column = {
    val newest = cells.map { case (_, c) =>
      coalesce(Cells.newestTs(c), lit(Long.MinValue)) }
    newest(0) >= newest(1)
  }
  override def serialize(): String = s"""{"colA":"$colA","colB":"$colB"}"""
  override def deserialize(state: String): Unit = state match {
    case NewerDependency.StateRe(a, b) => colA = a; colB = b
    case other => throw new IllegalArgumentException(
      s"""Cannot deserialize policy state '$other' (expected {"colA":…,"colB":…})""")
  }
}
object NewerDependency {
  private val StateRe = """\{"colA":"([^"]*)","colB":"([^"]*)"\}""".r
}

/** Fresh ⇔ the column has values and the newest version's timestamp is
  * ≥ `newerThanMs` (reference: `src/main/java/org/kiji/scoring/lib/NewerThan.java:65-84`). */
final class NewerThan(var newerThanMs: Long) extends FreshnessPolicy {
  def this() = this(-1L)
  override def isFresh(cell: Column, asOf: Long): Column =
    Cells.hasValues(cell) && Cells.newestTs(cell) >= lit(newerThanMs)
  override def serialize(): String = FreshnessPolicy.writeLongField("newerThan", newerThanMs)
  override def deserialize(state: String): Unit =
    newerThanMs = FreshnessPolicy.readLongField(state, "newerThan")
}
