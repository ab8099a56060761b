package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ColumnName
import graft.policy.{AlwaysFreshen, ShelfLife}
import graft.registry._

/** Registry CRUD + all 8 validation failure modes — mirrors
  * `src/test/java/org/kiji/scoring/TestKijiFreshnessManager.java:113-256`. */
class RegistrySpec extends AnyFunSuite with SparkSpec {

  private def mgr(): FreshnessManager = {
    val user = Fixtures.userRegistry(spark)
    new FreshnessManager(name => if (name == "user") Some(user.schema) else None)
  }
  private val incr = classOf[VisitsIncrement].getName

  private def failuresOf(f: => Unit): Set[ValidationFailure.Value] =
    intercept[FreshnessValidationException](f).failures.keySet

  test("store / retrieve / remove round-trip") {
    val m = mgr()
    m.storePolicy("user", ColumnName("info:name"), classOf[NameRewrite].getName, new ShelfLife(10L))
    val rec = m.retrievePolicy("user", ColumnName("info:name")).get
    assert(rec.policyClass == classOf[ShelfLife].getName)
    assert(rec.policyState == """{"shelfLife":10}""")
    assert(rec.recordVersion == FreshnessRecord.CurrentVersion)
    assert(m.retrievePolicies("user").keySet == Set(ColumnName("info:name")))
    m.removePolicy("user", ColumnName("info:name"))
    assert(m.retrievePolicy("user", ColumnName("info:name")).isEmpty)
  }

  test("removePolicy on absent column errors; removePolicies returns removed set") {
    val m = mgr()
    intercept[IllegalArgumentException](m.removePolicy("user", ColumnName("info:name")))
    m.storePolicyWithStrings("user", ColumnName("info:name"), "a.B", "c.D", "")
    m.storePolicyWithStrings("user", ColumnName("info:email"), "a.B", "c.D", "")
    assert(m.removePolicies("user") == Set(ColumnName("info:name"), ColumnName("info:email")))
    assert(m.retrievePolicies("user").isEmpty)
  }

  test("BAD_POLICY_NAME / BAD_PRODUCER_NAME") {
    val m = mgr()
    assert(failuresOf(m.storePolicyWithStrings("user", ColumnName("info:name"),
      "not a class", "al$o bad", "")) ==
      Set(ValidationFailure.BAD_POLICY_NAME, ValidationFailure.BAD_PRODUCER_NAME))
  }

  test("BAD_PRODUCER_NAME: valid name but not a Scorer on classpath") {
    val m = mgr()
    assert(failuresOf(m.storePolicy("user", ColumnName("info:name"),
      "com.example.NoSuchScorer", new AlwaysFreshen)) ==
      Set(ValidationFailure.BAD_PRODUCER_NAME))
  }

  test("NO_FAMILY_IN_TABLE / NO_QUALIFIED_COLUMN_IN_TABLE / missing table") {
    val m = mgr()
    assert(failuresOf(m.storePolicyWithStrings("user", ColumnName("absent:q"), "a.B", "c.D", ""))
      == Set(ValidationFailure.NO_FAMILY_IN_TABLE))
    assert(failuresOf(m.storePolicyWithStrings("user", ColumnName("info:absent"), "a.B", "c.D", ""))
      == Set(ValidationFailure.NO_QUALIFIED_COLUMN_IN_TABLE))
    assert(failuresOf(m.storePolicyWithStrings("nosuch", ColumnName("info:name"), "a.B", "c.D", ""))
      == Set(ValidationFailure.NO_FAMILY_IN_TABLE))
  }

  test("GROUP_TYPE_FAMILY_ATTACHMENT: cannot attach to whole group family") {
    val m = mgr()
    assert(failuresOf(m.storePolicyWithStrings("user", ColumnName("info"), "a.B", "c.D", ""))
      == Set(ValidationFailure.GROUP_TYPE_FAMILY_ATTACHMENT))
  }

  test("map-family attachment is allowed; qualified-into-map is allowed") {
    val m = mgr()
    m.storePolicyWithStrings("user", ColumnName("networks"), "a.B", "c.D", "")
    m.removePolicies("user")
    m.storePolicyWithStrings("user", ColumnName("networks:site"), "a.B", "c.D", "")
  }

  test("FRESHENER_ALREADY_ATTACHED: exclusivity in both directions") {
    val m = mgr()
    m.storePolicyWithStrings("user", ColumnName("networks"), "a.B", "c.D", "")
    assert(failuresOf(m.storePolicyWithStrings("user", ColumnName("networks:site"), "a.B", "c.D", ""))
      == Set(ValidationFailure.FRESHENER_ALREADY_ATTACHED))
    val m2 = mgr()
    m2.storePolicyWithStrings("user", ColumnName("networks:site"), "a.B", "c.D", "")
    assert(failuresOf(m2.storePolicyWithStrings("user", ColumnName("networks"), "a.B", "c.D", ""))
      == Set(ValidationFailure.FRESHENER_ALREADY_ATTACHED))
  }

  test("PRODUCER_OUTPUT_COLUMN_DOES_NOT_MATCH") {
    val m = mgr()
    assert(failuresOf(m.storePolicy("user", ColumnName("info:name"),
      classOf[WrongOutputScorer].getName, new AlwaysFreshen))
      == Set(ValidationFailure.PRODUCER_OUTPUT_COLUMN_DOES_NOT_MATCH))
  }

  test("PRODUCER_REQUEST_CANNOT_BE_FULFILLED") {
    val m = mgr()
    assert(failuresOf(m.storePolicy("user", ColumnName("info:name"),
      classOf[BadRequestScorer].getName, new AlwaysFreshen))
      == Set(ValidationFailure.PRODUCER_REQUEST_CANNOT_BE_FULFILLED))
  }

  test("validation failure messages are string-identical to the reference") {
    // mirrors `test/TestKijiFreshnessManager.java:172-243` assertEquals calls
    def msgOf(f: => Unit): String =
      intercept[FreshnessValidationException](f).getMessage
    val m = mgr()
    assert(msgOf(m.storePolicyWithStrings("user", ColumnName("info:invalid"), "a.B", "c.D", "")) ==
      "There were validation failures.\nNO_QUALIFIED_COLUMN_IN_TABLE: Table: user does" +
        " not contain specified column: info:invalid")
    assert(msgOf(m.storePolicyWithStrings("user", ColumnName("info"), "a.B", "c.D", "")) ==
      "There were validation failures.\nGROUP_TYPE_FAMILY_ATTACHMENT: Specified " +
        "family: info is not a valid Map Type family in the table: user")
    m.storePolicyWithStrings("user", ColumnName("networks"), "a.B", "c.D", "")
    assert(msgOf(m.storePolicyWithStrings("user", ColumnName("networks:qualifier"), "a.B", "c.D", "")) ==
      "There were validation failures.\nFRESHENER_ALREADY_ATTACHED: There is already a" +
        " freshness policy attached to family: networks Freshness " +
        "policies may not be attached to a map type family and fully qualified columns within " +
        "that family.")
    m.removePolicy("user", ColumnName("networks"))
    m.storePolicyWithStrings("user", ColumnName("networks:qualifier"), "a.B", "c.D", "")
    assert(msgOf(m.storePolicyWithStrings("user", ColumnName("networks"), "a.B", "c.D", "")) ==
      "There were validation failures.\nFRESHENER_ALREADY_ATTACHED: There is already a" +
        " freshness policy attached to a fully qualified column in " +
        "family: networks Freshness policies may not be attached to a map type family and fully" +
        " qualified columns within that family. To view a list of attached freshness policies " +
        "check log files for KijiFreshnessManager.")
    val m2 = mgr()
    assert(msgOf(m2.storePolicyWithStrings("user", ColumnName("networks"),
      "kiji..producer", "kiji.policy.policy", "")) ==
      "There were validation failures.\nBAD_PRODUCER_NAME: Producer class name: " +
        "kiji..producer is not a valid Java class identifier.")
    assert(msgOf(m2.storePolicyWithStrings("user", ColumnName("networks"),
      "kiji.a.producer", "kiji.", "")) ==
      "There were validation failures.\nBAD_POLICY_NAME: Policy class name: kiji. is " +
        "not a valid Java class identifier.")
    assert(msgOf(m2.storePolicyWithStrings("user", ColumnName("networks"),
      "kiji.a.producer", ".kiji", "")) ==
      "There were validation failures.\nBAD_POLICY_NAME: Policy class name: .kiji is " +
        "not a valid Java class identifier.")
  }

  test("re-attach to the SAME map-qualified column is FRESHENER_ALREADY_ATTACHED") {
    val m = mgr()
    m.storePolicyWithStrings("user", ColumnName("networks:site"), "a.B", "c.D", "")
    assert(failuresOf(m.storePolicyWithStrings("user", ColumnName("networks:site"), "a.B", "c.D", ""))
      == Set(ValidationFailure.FRESHENER_ALREADY_ATTACHED))
  }

  test("isValidClassName") {
    val m = mgr()
    assert(m.isValidClassName("org.kiji.scoring.lib.ShelfLife"))
    assert(m.isValidClassName("Simple"))
    assert(!m.isValidClassName(""))
    assert(!m.isValidClassName("has space.Class"))
    assert(!m.isValidClassName("trailing.dot."))
    assert(!m.isValidClassName("1starts.WithDigit"))
  }

  test("save/load round-trips states containing quotes and backslashes") {
    val m = mgr()
    m.storePolicyWithStrings("user", ColumnName("info:name"), "a.B", "c.D",
      """{"path":"C:\\tmp","note":"say \"hi\""}""")
    val f = java.io.File.createTempFile("graft-registry-esc", ".jsonl")
    m.save(f.getAbsolutePath)
    val m2 = mgr()
    m2.load(f.getAbsolutePath)
    assert(m2.retrievePolicy("user", ColumnName("info:name")).get.policyState ==
      """{"path":"C:\\tmp","note":"say \"hi\""}""")
    f.delete()
  }

  test("save/load persistence round-trip") {
    val m = mgr()
    m.storePolicy("user", ColumnName("info:name"), classOf[NameRewrite].getName,
      new ShelfLife(86400000L))
    val f = java.io.File.createTempFile("graft-registry", ".jsonl")
    m.save(f.getAbsolutePath)
    val m2 = mgr()
    m2.load(f.getAbsolutePath)
    assert(m2.retrievePolicy("user", ColumnName("info:name")) ==
      m.retrievePolicy("user", ColumnName("info:name")))
    f.delete()
  }

  test("saveAvro/loadAvro: Avro-binary codec round-trips, including odd strings") {
    val m = mgr()
    m.storePolicy("user", ColumnName("info:name"), classOf[NameRewrite].getName,
      new ShelfLife(86400000L))
    m.storePolicyWithStrings("user", ColumnName("info:email"), "a.B", "c.D",
      """{"path":"C:\\tmp","note":"say \"hi\""}""")
    val f = java.io.File.createTempFile("graft-registry", ".avro")
    m.saveAvro(f.getAbsolutePath)
    val m2 = mgr()
    m2.loadAvro(f.getAbsolutePath)
    assert(m2.retrievePolicies("user") == m.retrievePolicies("user"))
    // binary, not JSON text: the container header is the Avro magic
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(4)
    assert(head.sameElements(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte)))
    f.delete()
  }
}
