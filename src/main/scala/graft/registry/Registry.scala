package graft.registry

import scala.collection.mutable

import org.apache.spark.sql.types.StructType

import graft.model.{ColumnName, EntityView}
import graft.policy.FreshnessPolicy
import graft.score.Scorer

/** Persisted attachment record — mirrors the Avro
  * `KijiFreshnessPolicyRecord` {record_version, producer_class,
  * freshness_policy_class, freshness_policy_state}
  * (reference: `src/main/avro/KijiFreshnessPolicy.avdl:29-41`). */
final case class FreshnessRecord(
    tableName: String,
    column: ColumnName,
    producerClass: String,
    policyClass: String,
    policyState: String,
    recordVersion: String = FreshnessRecord.CurrentVersion)

object FreshnessRecord {
  /** Matches the reference's record version for compatibility checks
    * (reference: `KijiFreshnessManager.java:71-77`). */
  val CurrentVersion = "policyrecord-0.1.0"
}

/** Validation failure modes — same enum (and enum-constant spellings) as the
  * reference (reference: `src/main/java/org/kiji/scoring/KijiFreshnessManager.java:345-354`). */
object ValidationFailure extends Enumeration {
  val BAD_POLICY_NAME, BAD_PRODUCER_NAME, NO_FAMILY_IN_TABLE,
      NO_QUALIFIED_COLUMN_IN_TABLE, FRESHENER_ALREADY_ATTACHED,
      GROUP_TYPE_FAMILY_ATTACHMENT, PRODUCER_OUTPUT_COLUMN_DOES_NOT_MATCH,
      PRODUCER_REQUEST_CANNOT_BE_FULFILLED = Value
}

/** Aggregate of all failures for one attachment attempt; message format is
  * string-identical to the reference's
  * (reference: `KijiFreshnessManager.java:359-398`, pinned by
  * `test/TestKijiFreshnessManager.java:172-243`). */
final class FreshnessValidationException(
    val failures: Map[ValidationFailure.Value, String])
  extends RuntimeException(
    failures.map { case (k, v) => s"\n$k: $v" }
      .mkString("There were validation failures.", "", ""))

/** The freshness-policy registry — the metatable analogue
  * (reference: `KijiFreshnessManager.java:148-342`, records stored under
  * `kiji.scoring.fresh.<column>` keys at `:80,235-239`).
  *
  * Backed by an in-memory map with JSON-lines persistence; at 100 TB scale
  * the registry stays tiny (one row per attached column) and is broadcast
  * with the job, so this is deliberately not a distributed structure.
  *
  * `schemaOf` supplies the entity-view schema for attachment validation
  * (the layout check at `KijiFreshnessManager.java:574-637`).
  */
final class FreshnessManager(schemaOf: String => Option[StructType]) {

  // guarded by `records`' own monitor: the reference documents that manager
  // instances are shared across reader threads
  // (`FreshKijiTableReader.java:129-136`)
  private val records = mutable.LinkedHashMap.empty[(String, String), FreshnessRecord]
  private def sync[A](f: => A): A = records.synchronized(f)

  // ------------------------------------------------------------- validation

  /** Dotted-Java-identifier check (reference: `KijiFreshnessManager.java:174-195`). */
  def isValidClassName(name: String): Boolean =
    name.nonEmpty && name.split("\\.", -1).forall(seg =>
      seg.nonEmpty && Character.isJavaIdentifierStart(seg.head) &&
        seg.tail.forall(Character.isJavaIdentifierPart))

  /** Attachment-time validation, all 8 modes aggregated. Failure messages
    * are string-identical to the reference's
    * (reference: `KijiFreshnessManager.java:546-641`; exact strings pinned
    * by `test/TestKijiFreshnessManager.java:172-243`). */
  def validateAttachment(tableName: String, column: ColumnName,
      producerClass: String, policyClass: String,
      checkClasspath: Boolean): Map[ValidationFailure.Value, String] = {
    val fails = mutable.LinkedHashMap.empty[ValidationFailure.Value, String]
    if (!isValidClassName(policyClass))
      fails(ValidationFailure.BAD_POLICY_NAME) =
        s"Policy class name: $policyClass is not a valid Java class identifier."
    if (!isValidClassName(producerClass))
      fails(ValidationFailure.BAD_PRODUCER_NAME) =
        s"Producer class name: $producerClass is not a valid Java class identifier."

    schemaOf(tableName) match {
      case None =>
        // the reference throws KijiTableNotFoundException before validating;
        // with a schema provider this surfaces as a family failure instead
        fails(ValidationFailure.NO_FAMILY_IN_TABLE) =
          s"Table: $tableName does not contain family: ${column.family}"
      case Some(schema) =>
        if (!EntityView.familyExists(schema, column.family))
          fails(ValidationFailure.NO_FAMILY_IN_TABLE) =
            s"Table: $tableName does not contain family: ${column.family}"
        else column.qualifier match {
          case Some(_) =>
            if (!EntityView.qualifiedColumnExists(schema, column))
              fails(ValidationFailure.NO_QUALIFIED_COLUMN_IN_TABLE) =
                s"Table: $tableName does not contain specified column: $column"
            // attachment-exclusivity inside a map family: a qualified attach
            // conflicts with a family-wide record, or with an existing
            // record on the SAME column (reference `:593-605`; the reads
            // are sync'd because validateAttachment is also called directly
            // — CLI validate — and must not race store/remove; the monitor
            // is reentrant, so the store() path nests fine)
            if (EntityView.isMapFamily(schema, column.family)) {
              if (sync(records.contains((tableName, column.family))))
                fails(ValidationFailure.FRESHENER_ALREADY_ATTACHED) =
                  s"There is already a freshness policy attached to family: " +
                    s"${column.family} Freshness policies may not be attached to a " +
                    "map type family and fully qualified columns within that family."
              else if (sync(records.contains((tableName, column.toString))))
                fails(ValidationFailure.FRESHENER_ALREADY_ATTACHED) =
                  s"There is already a freshness policy attached to column: $column"
            }
          case None =>
            if (EntityView.isGroupFamily(schema, column.family) &&
                !EntityView.isMapFamily(schema, column.family))
              fails(ValidationFailure.GROUP_TYPE_FAMILY_ATTACHMENT) =
                s"Specified family: $column is not a valid Map Type family " +
                  s"in the table: $tableName"
            else {
              // family attach conflicts with existing qualified-column
              // records (materialized inside sync — see above)
              val qualifiedAttached = sync(records.keys.collect {
                case (t, c) if t == tableName &&
                  ColumnName(c).family == column.family && c.contains(":") => c
              }.toList)
              if (qualifiedAttached.nonEmpty)
                fails(ValidationFailure.FRESHENER_ALREADY_ATTACHED) =
                  s"There is already a freshness policy attached to a fully " +
                    s"qualified column in family: $column Freshness policies may " +
                    "not be attached to a map type family and fully qualified " +
                    "columns within that family. To view a list of attached " +
                    "freshness policies check log files for KijiFreshnessManager."
            }
        }
    }

    if (checkClasspath && !fails.contains(ValidationFailure.BAD_PRODUCER_NAME)) {
      // Post-attachment producer-vs-layout checks
      // (reference: `KijiFreshnessManager.java:411-498`). Stricter than the
      // reference on output columns: qualification-level disagreement AND
      // differing fully-qualified columns both fail (the reference checks
      // only the former), with the reference's message.
      try {
        val scorer = Scorer.load(producerClass)
        val out = scorer.outputColumn
        if ((out.isFullyQualified != column.isFullyQualified) ||
            (out.isFullyQualified && column.isFullyQualified && out != column))
          fails(ValidationFailure.PRODUCER_OUTPUT_COLUMN_DOES_NOT_MATCH) =
            "Producer output column and attachment column qualifications do " +
              "not agree.  Both must be either unqualified or fully qualified.  " +
              s"Producer column: $out Attachment column: $column"
        schemaOf(tableName).foreach { schema =>
          val missing = scorer.dataRequest.columns.filterNot(c =>
            EntityView.qualifiedColumnExists(schema, c) ||
              (!c.isFullyQualified && EntityView.familyExists(schema, c.family)))
          missing.headOption.foreach { c =>
            fails(ValidationFailure.PRODUCER_REQUEST_CANNOT_BE_FULFILLED) =
              s"Column: $c in producer data request does not exist in table: " +
                s"$tableName check KijiFreshnessManager log files for other " +
                "invalid columns."
          }
        }
      } catch {
        case _: ClassNotFoundException | _: ClassCastException =>
          fails(ValidationFailure.BAD_PRODUCER_NAME) =
            s"Producer class '$producerClass' is not a Scorer on the classpath."
      }
    }
    fails.toMap
  }

  // -------------------------------------------------------------- mutation

  /** Attach a policy+producer to a column (reference:
    * `KijiFreshnessManager.java:148-167,217-243`). Throws
    * [[FreshnessValidationException]] aggregating every failed check. */
  def storePolicy(tableName: String, column: ColumnName, producerClass: String,
      policy: FreshnessPolicy): Unit =
    store(tableName, column, producerClass, policy.getClass.getName,
      policy.serialize(), checkClasspath = true)

  /** String variant that skips classpath checks — the `--as-strings` path
    * (reference: `KijiFreshnessManager.java:217-243`, `tools/FreshTool.java:190-221`);
    * the registry tolerates unresolvable class names until use. */
  def storePolicyWithStrings(tableName: String, column: ColumnName,
      producerClass: String, policyClass: String, policyState: String): Unit =
    store(tableName, column, producerClass, policyClass, policyState,
      checkClasspath = false)

  private def store(tableName: String, column: ColumnName, producerClass: String,
      policyClass: String, policyState: String, checkClasspath: Boolean): Unit = sync {
    val fails = validateAttachment(tableName, column, producerClass, policyClass, checkClasspath)
    if (fails.nonEmpty) throw new FreshnessValidationException(fails)
    records((tableName, column.toString)) =
      FreshnessRecord(tableName, column, producerClass, policyClass, policyState)
  }

  /** Point lookup; None if nothing attached (reference: `:255-273`). */
  def retrievePolicy(tableName: String, column: ColumnName): Option[FreshnessRecord] =
    sync(records.get((tableName, column.toString)))

  /** All records for a table (reference: `:283-295`). */
  def retrievePolicies(tableName: String): Map[ColumnName, FreshnessRecord] =
    sync(records.collect { case ((t, c), r) if t == tableName => ColumnName(c) -> r }.toMap)

  /** Remove one attachment; error if absent (reference: `:305-317`). */
  def removePolicy(tableName: String, column: ColumnName): Unit =
    if (sync(records.remove((tableName, column.toString))).isEmpty)
      throw new IllegalArgumentException(
        s"There is no freshness policy attached to column '$column' in table '$tableName'")

  /** Remove all attachments for a table, returning the removed set
    * (reference: `:327-342`). */
  def removePolicies(tableName: String): Set[ColumnName] = sync {
    val removed = records.keys.collect {
      case (t, c) if t == tableName => ColumnName(c)
    }.toSet
    removed.foreach(c => records.remove((tableName, c.toString)))
    removed
  }

  // ----------------------------------------------------------- persistence

  /** JSON-lines snapshot (record serde analogue of the Avro encode at
    * `KijiFreshnessManager.java:235-239`). */
  def save(path: String): Unit = sync {
    val lines = records.values.map { r =>
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      s"""{"table":${q(r.tableName)},"column":${q(r.column.toString)},""" +
        s""""record_version":${q(r.recordVersion)},"producer_class":${q(r.producerClass)},""" +
        s""""policy_class":${q(r.policyClass)},"policy_state":${q(r.policyState)}}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  def load(path: String): Unit = {
    // field pattern tolerates escaped quotes/backslashes; every field is
    // unescaped symmetrically with save()'s escaping
    val F = """"((?:[^"\\]|\\.)*)""""
    val Re = (s"""\\{"table":$F,"column":$F,"record_version":$F,""" +
      s""""producer_class":$F,"policy_class":$F,"policy_state":$F\\}""").r
    def un(s: String): String = s.replace("\\\"", "\"").replace("\\\\", "\\")
    scala.io.Source.fromFile(path, "UTF-8").getLines().filter(_.nonEmpty).foreach {
      case Re(t, c, rv, pc, fc, st) => sync {
        records((un(t), un(c))) =
          FreshnessRecord(un(t), ColumnName(un(c)), un(pc), un(fc), un(st), un(rv))
      }
      case line => throw new IllegalArgumentException(s"Bad registry line: $line")
    }
  }

  /** Record schema mirroring the reference's Avro IDL field-for-field
    * (reference: `src/main/avro/KijiFreshnessPolicy.avdl:29-41`), plus the
    * (table, column) metatable key the reference keeps outside the record
    * (`KijiFreshnessManager.java:80,235-239` store records under
    * `kiji.scoring.fresh.<column>` metatable keys — there is no metatable
    * here, so the key rides in-band). */
  private val avroSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"KijiFreshnessPolicyRecord",
      |"namespace":"org.kiji.scoring.avro","fields":[
      |{"name":"table","type":"string"},
      |{"name":"column","type":"string"},
      |{"name":"record_version","type":"string"},
      |{"name":"producer_class","type":"string"},
      |{"name":"freshness_policy_class","type":"string"},
      |{"name":"freshness_policy_state","type":"string"}]}""".stripMargin)

  /** Avro-BINARY snapshot — the reference's actual wire format for policy
    * records (`KijiFreshnessManager.java:235-239`), as an Avro container
    * file. Interchangeable with the JSON-lines [[save]]/[[load]] codec
    * behind the same registry interface. */
  def saveAvro(path: String): Unit = sync {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new java.io.File(path))
    try records.values.foreach { r =>
      val rec = new GenericData.Record(avroSchema)
      rec.put("table", r.tableName)
      rec.put("column", r.column.toString)
      rec.put("record_version", r.recordVersion)
      rec.put("producer_class", r.producerClass)
      rec.put("freshness_policy_class", r.policyClass)
      rec.put("freshness_policy_state", r.policyState)
      w.append(rec)
    } finally w.close()
  }

  /** Load an Avro container written by [[saveAvro]] (schema-checked by the
    * Avro reader against the writer schema embedded in the file). */
  def loadAvro(path: String): Unit = {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val rd = new DataFileReader[GenericRecord](new java.io.File(path),
      new GenericDatumReader[GenericRecord](avroSchema))
    try while (rd.hasNext) {
      val rec = rd.next()
      def s(f: String) = rec.get(f).toString
      sync {
        records((s("table"), s("column"))) = FreshnessRecord(s("table"),
          ColumnName(s("column")), s("producer_class"),
          s("freshness_policy_class"), s("freshness_policy_state"),
          s("record_version"))
      }
    } finally rd.close()
  }
}
