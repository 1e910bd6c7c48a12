package graft.data

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.model.Catalog

/** Deterministic (seed 42) SAP-shaped fixture generator mirroring the
  * reference's test-data semantics (SURVEY §2.1: zero-padded NUMC ids,
  * balanced journal entries, open/cleared splits, aging buckets, O2C chains,
  * actual-vs-plan cost postings). Small by design — these fixtures exercise
  * the template library and governance gate in ScalaTest; the TPC-H corpus
  * covers scale.
  */
object SapFixtures {

  private val seed = 42
  private def pad(n: Long, w: Int): String = s"%0${w}d".format(n)

  /** Generate every catalog table as a DataFrame and register temp views.
    * All rows derive from the fixed seed — identical across runs. */
  def register(spark: SparkSession): Map[String, DataFrame] = {
    val rnd = new scala.util.Random(seed)
    val nDocs = 40
    val vendors = (1 to 8).map(i => (pad(i, 10), s"Vendor ${('A' + i - 1).toChar}",
      if (i % 3 == 0) "DE" else "US", ""))
    val customers = (1 to 8).map(i => (pad(100 + i, 10), s"Customer $i",
      if (i % 2 == 0) "FR" else "US", if (i == 8) "X" else ""))

    // Balanced journal entries: each document gets one debit and one credit
    // line of the same amount (reference build_sap_test_db.py semantics).
    val bkpf = (1 to nDocs).map { i =>
      Row("1000", pad(i, 10), "2025", if (i % 4 == 0) "KR" else "SA",
        f"2025-${i % 12 + 1}%02d-10", f"2025-${i % 12 + 1}%02d-12",
        pad(i % 12 + 1, 2), "USD", s"USER${i % 3}", "FB01")
    }
    val bseg = (1 to nDocs).flatMap { i =>
      val amt = BigDecimal((rnd.nextInt(90000) + 1000) / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val vendor = if (i % 4 == 0) vendors(i % vendors.size)._1 else null
      val customer = if (i % 5 == 0) customers(i % customers.size)._1 else null
      Seq(
        Row("1000", pad(i, 10), "2025", "001", "S", amt, pad(400000 + i % 5, 10),
          if (i % 2 == 0) pad(i % 4 + 1, 10) else null, vendor, customer, "S", null),
        Row("1000", pad(i, 10), "2025", "002", "H", amt, pad(100000 + i % 3, 10),
          null, null, null, if (vendor != null) "K" else "S",
          if (i % 3 == 0) f"2025-${i % 12 + 1}%02d-20" else null))
    }

    // Vendor open/cleared items with aging spread around the pinned as-of
    // date (reference expand_sap_test_db.py aging buckets).
    val asOf = java.time.LocalDate.parse("2025-06-15")
    val bsik = (1 to 24).map { i =>
      val due = asOf.minusDays((i % 6) * 22L - 10)
      Row("1000", vendors(i % vendors.size)._1, "2025", pad(5000 + i, 10), "001",
        if (i % 7 == 0) "S" else "H",
        BigDecimal((i * 137 % 5000) + 100).setScale(2), "USD",
        due.minusDays(30).toString, due.toString, null)
    }
    val bsak = (1 to 16).map { i =>
      val due = asOf.minusDays(100L + i)
      Row("1000", vendors(i % vendors.size)._1, "2025", pad(7000 + i, 10), "001", "H",
        BigDecimal((i * 211 % 4000) + 50).setScale(2), "USD",
        due.minusDays(30).toString, due.toString, due.plusDays(20).toString)
    }
    val bsid = (1 to 24).map { i =>
      val due = asOf.minusDays((i % 5) * 25L - 5)
      Row("1000", customers(i % customers.size)._1, "2025", pad(8000 + i, 10), "001", "S",
        BigDecimal((i * 173 % 6000) + 200).setScale(2), due.toString, null)
    }

    // GLT0 period balances (HSL01..HSL16 horizontal buckets).
    val glt0 = (0 until 6).map { i =>
      val vals = (1 to 16).map(p =>
        if (p <= 12) BigDecimal((i * 1000 + p * 37) % 5000).setScale(2)
        else null)
      Row(Seq("00", "1000", pad(400000 + i % 5, 10), "2025",
        if (i % 2 == 0) "S" else "H", BigDecimal(1000 * i).setScale(2)) ++ vals: _*)
    }
    val ska1 = (0 until 5).map(i => Row("INT1", pad(400000 + i, 10),
      if (i % 2 == 0) "X" else ""))
    val skat = (0 until 5).flatMap(i => Seq(
      Row("E", "INT1", pad(400000 + i, 10), s"Account $i", s"G/L account number $i"),
      Row("D", "INT1", pad(400000 + i, 10), s"Konto $i", s"Sachkonto $i")))
    val lfa1 = vendors.map(v => Row(v._1, v._2, v._3, v._4))
    val kna1 = customers.map(cu => Row(cu._1, cu._2, cu._3, cu._4))

    // P2P chain: PO → items → GR history.
    val ekko = (1 to 10).map(i => Row(pad(450000 + i, 10), vendors(i % vendors.size)._1,
      "1000", f"2025-${i % 6 + 1}%02d-05", "NB", if (i == 10) "X" else "", "USD"))
    val ekpo = (1 to 10).flatMap(i => (1 to 2).map(j =>
      Row(pad(450000 + i, 10), pad(j * 10, 5), s"MAT${pad(i * 10 + j, 6)}",
        BigDecimal(i * 10 + j).setScale(3), BigDecimal(25 + j).setScale(2),
        BigDecimal((i * 10 + j) * (25 + j)).setScale(2))))
    val ekbe = (1 to 8).map(i => Row(pad(450000 + i, 10), pad(10, 5), "1", "E", "101",
      f"2025-${i % 6 + 1}%02d-15", BigDecimal(i * 10 + 1).setScale(3),
      BigDecimal((i * 10 + 1) * 26).setScale(2), "S"))

    // O2C chain: order → flow → delivery → flow → billing.
    val vbak = (1 to 12).map(i => Row(pad(600000 + i, 10), customers(i % customers.size)._1,
      f"2025-${i % 6 + 1}%02d-03", "OR", "C", BigDecimal(i * 517 % 9000 + 500).setScale(2),
      "USD", ""))
    val likp = (1 to 9).map(i => Row(pad(800000 + i, 10), customers(i % customers.size)._1,
      f"2025-${i % 6 + 1}%02d-08", if (i <= 7) f"2025-${i % 6 + 1}%02d-09" else null, "LF"))
    val vbrk = (1 to 6).map(i => Row(pad(900000 + i, 10), customers(i % customers.size)._1,
      f"2025-${i % 6 + 1}%02d-12", BigDecimal(i * 517 % 9000 + 500).setScale(2), "USD", "M"))
    val vbfa = (1 to 9).map(i => Row(pad(600000 + i, 10), "000010",
      pad(800000 + i, 10), "000010", "J", BigDecimal(5).setScale(3))) ++
      (1 to 6).map(i => Row(pad(800000 + i, 10), "000010",
        pad(900000 + i, 10), "000010", "M", BigDecimal(5).setScale(3)))

    // CO: cost centers + actual (04) vs plan (01) line items.
    val csks = (1 to 4).map(i => Row("1000", pad(i, 10), "9999-12-31", "2020-01-01",
      "KS1000" + pad(i, 10)))
    val coep = (1 to 4).flatMap { cc =>
      (1 to 6).map { i =>
        Row("1000", pad(cc * 1000 + i, 10), pad(i, 3), "KS1000" + pad(cc, 10),
          pad(500000 + i % 3, 10), if (i % 2 == 0) "04" else "01",
          BigDecimal(cc * 100 + i * 13).setScale(2), "2025", pad(i, 3))
      }
    }
    val cosp = (1 to 4).flatMap(cc => Seq("04", "01").map { wt =>
      Row(Seq("KS1000" + pad(cc, 10), "2025", wt, pad(500000 + cc % 3, 10)) ++
        (1 to 12).map(p => BigDecimal(cc * 50 + p * 7).setScale(2)): _*)
    })

    // HR (protected): personal data uses yyyyMMdd dates (reference date-format
    // landmine, SURVEY §1.3).
    val pa0001 = (1 to 12).map(i => Row(pad(i, 8), s"Employee $i", "20200101",
      "99991231", pad(i % 3 + 1, 8), pad(i, 8), "1000"))
    val pa0002 = (1 to 12).map(i => Row(pad(i, 8), s"Last$i", s"First$i",
      s"19${70 + i % 25}0${i % 9 + 1}15", "20200101", "99991231"))
    val hrpy = (1 to 12).map(i => Row(pad(i, 8), pad(i, 5), "20250101", "20250131", "USD"))

    val data: Map[String, Seq[Row]] = Map(
      "BKPF" -> bkpf, "BSEG" -> bseg, "GLT0" -> glt0, "SKA1" -> ska1,
      "SKAT" -> skat, "LFA1" -> lfa1, "KNA1" -> kna1, "BSIK" -> bsik,
      "BSAK" -> bsak, "BSID" -> bsid, "EKKO" -> ekko, "EKPO" -> ekpo,
      "EKBE" -> ekbe, "VBAK" -> vbak, "LIKP" -> likp, "VBRK" -> vbrk,
      "VBFA" -> vbfa, "CSKS" -> csks, "COEP" -> coep, "COSP" -> cosp,
      "PA0001" -> pa0001, "PA0002" -> pa0002, "HRPY_RGDIR" -> hrpy)

    data.map { case (name, rows) =>
      val schema = Catalog.Model.tableByName(name).sparkSchema
      // fixture rows are seeded positionally against the fixture-measured
      // column prefix; model-only business columns (merged in by Catalog)
      // sit after it and are null in fixtures
      val padded = rows.map(r => Row.fromSeq(r.toSeq.padTo(schema.length, null)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(padded.toSeq, 2), schema)
      df.createOrReplaceTempView(name)
      name -> df
    }
  }
}
