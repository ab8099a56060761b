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
