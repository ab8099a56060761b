package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-recomputed pins for the TPC-H-shape relational rollups q226–q229:
  * each query's result is re-derived in plain Scala collections (BigInt-free
  * here — all sums fit comfortably in Long at sf0.001) from the raw tables,
  * independent of both Spark's plan and the DuckDB oracle formulation. */
class TpchShapesSpec extends AnyFunSuite with SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  private def cents(d: Double): Long =
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .*(100).toLongExact

  private def day(us: Long): Long = Math.floorDiv(us, 86400000000L)

  private lazy val orders = graft.sources.Tables.load(spark, sf001, "orders")
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
      col("o_totalprice"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("o_us"))
    .collect()
    .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"),
      r.getAs[String]("o_orderpriority"), r.getAs[Double]("o_totalprice"),
      r.getAs[Long]("o_us")))

  private lazy val lineitem = graft.sources.Tables.load(spark, sf001, "lineitem")
    .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"),
      expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("l_us"))
    .collect()
    .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_suppkey"),
      r.getAs[Double]("l_quantity"), r.getAs[Long]("l_us")))

  test("q226 custdist: distribution equals the hand walk of the outer join") {
    val custs = graft.sources.Tables.load(spark, sf001, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val perCust = orders.filter(_._3 != "1-URGENT")
      .groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val counts = custs.map(c => perCust.getOrElse(c, 0L))
    val want = counts.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = graft.queries.Relational.q226Custdist(spark, sf001).collect()
      .map(r => (r.getAs[Long]("c_count"), r.getAs[Long]("custdist")))
    assert(got.toMap == want)
    // ordering pin: custdist desc, then c_count desc
    assert(got.sortBy { case (c, d) => (-d, -c) }.sameElements(got))
  }

  test("q227 dormant-rich: cross-multiply threshold + anti join, hand-walked") {
    val c = graft.sources.Tables.load(spark, sf001, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Int]("c_nationkey").toLong,
        cents(r.getAs[Double]("c_acctbal"))))
    val pos = c.filter(_._3 > 0L)
    val (nPos, sumPos) = (pos.length.toLong, pos.map(_._3).sum)
    val urgentCusts = orders.filter(_._3 == "1-URGENT").map(_._2).toSet
    val keep = c.filter { case (ck, _, bal) =>
      bal * nPos > sumPos && !urgentCusts.contains(ck) }
    val want = keep.groupBy(_._2).map { case (nk, v) =>
      nk -> ((v.length.toLong, v.map(_._3).sum)) }
    val got = graft.queries.Relational.q227DormantRich(spark, sf001).collect()
      .map(r => r.getAs[Long]("c_nationkey") ->
        ((r.getAs[Long]("n_cust"), r.getAs[Long]("total_cents")))).toMap
    assert(got == want)
  }

  test("q228 large orders: HAVING cut + join-back equals the hand rollup") {
    val perOrder = lineitem.groupBy(_._1)
      .map { case (k, v) => k -> v.map(l => cents(l._3)).sum }
      .filter(_._2 > 30000L)
    val got = graft.queries.Relational.q228LargeOrders(spark, sf001).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_day"),
        r.getAs[Long]("price_cents"), r.getAs[Long]("total_qty_c")))
    assert(got.map(_._1).toSet == perOrder.keySet)
    val byKey = orders.map(o => o._1 -> o).toMap
    got.foreach { case (ok, d, pc, tq) =>
      assert(tq == perOrder(ok))
      assert(pc == cents(byKey(ok)._4))
      assert(d == day(byKey(ok)._5))
    }
    assert(got.sortBy { case (ok, _, pc, _) => (-pc, ok) }.sameElements(got))
  }

  test("q239 top supplier per quarter: per-quarter maxima with ties, hand-walked") {
    val li = graft.sources.Tables.load(spark, sf001, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS ec",
        "100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS kp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val oq = graft.sources.Tables.load(spark, sf001, "orders")
      .selectExpr("o_orderkey",
        "CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS yr",
        "CAST(quarter(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS qtr")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rev = li.groupBy(l => (oq(l._1), l._2))
      .map { case (k, v) => k -> v.map(l => l._3 * l._4).sum }
    val best = rev.groupBy(_._1._1).flatMap { case (q, m) =>
      val mx = m.values.max
      m.collect { case (((y, qt), sk), r) if r == mx => (y, qt, sk, r) }
    }.toSet
    val names = graft.sources.Tables.load(spark, sf001, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.queries.Relational.q239TopSupplierQuarter(spark, sf001)
      .collect().map(r => (r.getAs[Long]("yr"), r.getAs[Long]("qtr"),
        r.getAs[String]("s_name"), r.getAs[Long]("revenue_cp"))).toSet
    assert(got == best.map { case (y, q, sk, r) => (y, q, names(sk), r) })
  }

  test("q240 cheapest offer: min(price, supplier) per part among ASIA suppliers") {
    val asia = {
      val n = graft.sources.Tables.load(spark, sf001, "nation")
        .select("n_nationkey", "n_regionkey").collect()
        .map(r => r.getInt(0).toLong -> r.getInt(1).toLong).toMap
      val rAsia = graft.sources.Tables.load(spark, sf001, "region")
        .collect().collectFirst {
          case r if r.getAs[String]("r_name") == "ASIA" => r.getInt(0).toLong }.get
      graft.sources.Tables.load(spark, sf001, "supplier")
        .select("s_suppkey", "s_nationkey").collect()
        .collect { case r if n(r.getInt(1).toLong) == rAsia => r.getLong(0) }.toSet
    }
    val li = graft.sources.Tables.load(spark, sf001, "lineitem")
      .selectExpr("l_partkey", "l_suppkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(l => asia.contains(l._2))
    val want = li.groupBy(_._1).map { case (p, offers) =>
      p -> offers.map(o => (o._3, o._2)).min
    }
    val got = graft.queries.Relational.q240CheapestOffer(spark, sf001).collect()
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Long]("price_cents"), r.getAs[String]("s_name")))).toMap
    val names = graft.sources.Tables.load(spark, sf001, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want.map { case (p, (pc, sk)) => p -> ((pc, names(sk))) })
  }

  test("q241 grouping sets: the three sets partition the rows; gid disambiguates") {
    val c = graft.sources.Tables.load(spark, sf001, "customer")
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = graft.queries.Relational.q241GroupingSets(spark, sf001).collect()
      .map(r => (r.getAs[Long]("gid"), Option(r.getAs[Any]("nation")),
        Option(r.getAs[String]("c_mktsegment"))) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_cents")))).toMap
    type Key = (Long, Option[Any], Option[String])
    val byNation: Map[Key, (Long, Long)] = c.groupBy(_._1).map { case (n, v) =>
      ((1L, Some(n: Any): Option[Any], None: Option[String]): Key) ->
        ((v.length.toLong, v.map(_._3).sum)) }
    val bySeg: Map[Key, (Long, Long)] = c.groupBy(_._2).map { case (s, v) =>
      ((2L, None: Option[Any], Some(s): Option[String]): Key) ->
        ((v.length.toLong, v.map(_._3).sum)) }
    val global: Map[Key, (Long, Long)] = Map(
      ((3L, None: Option[Any], None: Option[String]): Key) ->
        ((c.length.toLong, c.map(_._3).sum)))
    assert(got == byNation ++ bySeg ++ global)
  }

  test("q229 blocking supplier: the sole-late-supplier charge, hand-walked") {
    val oDay = orders.map(o => o._1 -> day(o._5)).toMap
    val numwait = lineitem.groupBy(_._1).toSeq.flatMap { case (ok, lines) =>
      val supps = lines.map(_._2).distinct
      val late = lines.filter(l => day(l._4) - oDay(ok) > 60L).map(_._2).distinct
      if (supps.length >= 2 && late.length == 1) Some(late.head) else None
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val names = graft.sources.Tables.load(spark, sf001, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("s_name")).toMap
    val want = numwait.map { case (sk, n) => names(sk) -> n }
    val got = graft.queries.Relational.q229BlockingSupplier(spark, sf001)
      .collect().map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait")))
    assert(got.toMap == want)
    assert(got.sortBy { case (n, w) => (-w, n) }.sameElements(got))
  }

  private lazy val liFull = graft.sources.Tables.load(spark, sf001, "lineitem")
    .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    .collect()
    .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Double]("l_quantity").toLong,
      cents(r.getAs[Double]("l_extendedprice")),
      100L - cents(r.getAs[Double]("l_discount"))))

  test("q248 small-qty revenue: the 5·qty·cnt < sum predicate, hand-walked") {
    val brandParts = graft.sources.Tables.load(spark, sf001, "part")
      .filter(col("p_brand") === "Brand#12").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val items = liFull.filter(i => brandParts.contains(i._1))
    val perPart = items.groupBy(_._1).map { case (k, v) =>
      k -> ((v.map(_._2).sum, v.length.toLong)) }
    val kept = items.filter { case (pk, qty, _, _) =>
      val (sumQty, cnt) = perPart(pk); 5L * qty * cnt < sumQty }
    val row = graft.queries.Relational.q248SmallQtyRevenue(spark, sf001)
      .collect().head
    if (kept.isEmpty) {
      assert(row.isNullAt(row.fieldIndex("small_qty_cents")))
      assert(row.getAs[Long]("n_small") == 0L)
    } else {
      assert(row.getAs[Long]("small_qty_cents") == kept.map(_._3).sum)
      assert(row.getAs[Long]("n_small") == kept.length.toLong)
    }
  }

  test("q274 window suite: ntile/rank/cume/nth_value equal the hand walk per nation") {
    val cust = graft.sources.Tables.load(spark, sf001, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS nation",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal")
      .collect().map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("nation"),
        r.getAs[Long]("bal")))
    val want = cust.groupBy(_._2).toSeq.flatMap { case (nation, cs) =>
      val sorted = cs.sortBy { case (ck, _, bal) => (-bal, ck) }
      val n = sorted.length
      sorted.zipWithIndex.map { case ((ck, _, bal), i) =>
        // ntile(4): first (n mod 4) tiles get ceil(n/4) rows
        val big = n % 4; val small = n / 4
        val quartile =
          if (i < big * (small + 1)) i / (small + 1) + 1
          else big + (i - big * (small + 1)) / small + 1
        // (bal, ck) is a total order, so rank == row_number == i+1 and the
        // RANGE cume count has no peers beyond the row itself
        val cume = sorted.count { case (ck2, _, b2) =>
          b2 > bal || (b2 == bal && ck2 <= ck) }
        val second = if (n >= 2) Some(sorted(1)._3) else None
        (ck, (nation, bal, quartile.toLong, (i + 1).toLong, n.toLong,
          i.toLong, cume.toLong, second))
      }
    }.toMap
    val got = graft.queries.Relational.q274WindowSuite(spark, sf001).collect()
      .map { r =>
        r.getAs[Long]("c_custkey") -> ((r.getAs[Long]("nation"),
          r.getAs[Long]("bal"), r.getAs[Long]("quartile"), r.getAs[Long]("rnk"),
          r.getAs[Long]("n_in_nation"), r.getAs[Long]("pct_rank_num"),
          r.getAs[Long]("cume_num"),
          if (r.isNullAt(r.fieldIndex("second_bal"))) None
          else Some(r.getAs[Long]("second_bal"))))
      }.toMap
    assert(got == want.filter(_._1 % 10 == 0))
    assert(got.nonEmpty)
  }

  test("q275 WoW contribution: conditional two-week aggregate + ppm shares, hand-walked") {
    val wkRows = orders.map { o =>
      (o._2, Math.floorDiv(o._5, 604800000000L), cents(o._4))
    }
    val w1 = wkRows.map(_._2).max
    val w0 = w1 - 1
    val nat = graft.sources.Tables.load(spark, sf001, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Int]("c_nationkey").toLong)
      .toMap
    val per = wkRows.filter(r => r._2 == w0 || r._2 == w1)
      .groupBy(r => nat(r._1)).map { case (nation, rs) =>
        nation -> ((rs.filter(_._2 == w0).map(_._3).sum,
          rs.filter(_._2 == w1).map(_._3).sum))
      }
    val totalDelta = per.values.map { case (a, b) => b - a }.sum
    val got = graft.queries.Relational.q275WowContribution(spark, sf001)
      .collect().map(r => r.getAs[Long]("nation") ->
        ((r.getAs[Long]("rev_w0"), r.getAs[Long]("rev_w1"),
          r.getAs[Long]("delta"), r.getAs[Long]("total_delta"),
          r.getAs[Long]("contrib_ppm")))).toMap
    assert(got.keySet == per.keySet)
    got.foreach { case (nation, (r0, r1, d, td, ppm)) =>
      val (w0r, w1r) = per(nation)
      assert((r0, r1, d, td) == ((w0r, w1r, w1r - w0r, totalDelta)))
      // the shared floor-div helper assumes a positive denominator; only
      // pin the ppm when the fixture's total delta is in that regime
      if (totalDelta > 0) {
        val m = (BigInt(d) * 1000000) /% BigInt(totalDelta)
        val wantPpm = (if (m._2 < 0) m._1 - 1 else m._1).toLong
        assert(ppm == wantPpm)
      }
    }
  }

  test("q265 priority-exists: the late-shipment EXISTS census, hand-walked") {
    val inQ = orders.filter { o =>
      o._5 >= 867715200000000L && o._5 < 875664000000000L // [1997-07-01, 1997-10-01)
    }
    val lateOrders = lineitem.groupBy(_._1).collect {
      case (ok, lines) if inQ.exists(_._1 == ok) => ok -> lines
    }.toMap
    val want = inQ.filter { o =>
      lateOrders.getOrElse(o._1, Array.empty[(Long, Long, Double, Long)])
        .exists(l => day(l._4) > day(o._5) + 90L)
    }.groupBy(_._3).map { case (p, v) => p -> v.length.toLong }
    val got = graft.queries.Relational.q265PriorityExists(spark, sf001)
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        r.getAs[Long]("order_cnt")).toMap
    assert(got == want)
  }

  test("q249 promo share: conditional aggregate + floor-div ppm, hand-walked") {
    val promoParts = graft.sources.Tables.load(spark, sf001, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val inMonth = graft.sources.Tables.load(spark, sf001, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getAs[Long]("l_partkey"),
        cents(r.getAs[Double]("l_extendedprice")) *
          (100L - cents(r.getAs[Double]("l_discount")))))
    val promo = inMonth.filter(i => promoParts.contains(i._1)).map(_._2).sum
    val total = inMonth.map(_._2).sum
    val row = graft.queries.Relational.q249PromoShare(spark, sf001).collect().head
    assert(row.getAs[Long]("promo_cp") == promo)
    assert(row.getAs[Long]("total_cp") == total)
    assert(row.getAs[Long]("promo_ppm") ==
      (BigInt(promo) * 1000000 / BigInt(total)).toLong)
  }
}
