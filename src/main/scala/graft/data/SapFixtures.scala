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
  private def d2(x: Double): BigDecimal = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
  private def d3(x: Double): BigDecimal = BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP)

  /** Build a Row for `table` from a column-name→value map (schema order from
    * the merged catalog; unnamed columns become null). Robust against column
    * additions, unlike the positional legacy seeds. */
  private def rowFor(table: String, values: Map[String, Any]): Row = {
    val schema = Catalog.Model.tableByName(table).sparkSchema
    Row.fromSeq(schema.fields.toSeq.map(f => values.getOrElse(f.name, null)))
  }

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
    // POs 1-2 receive in TWO partial deliveries (same item, two history
    // rows summing to i*10+1) — goods-receipt history is multi-row per item
    // in real systems, and single-row fixtures can't catch receipt-count
    // multiplication bugs in templates that join EKBE below item grain
    val ekbe = (1 to 8).flatMap { i =>
      val qty = i * 10 + 1
      val rows =
        if (i <= 2) Seq((qty / 2, "-15"), (qty - qty / 2, "-18"))
        else Seq((qty, "-15"))
      rows.map { case (q, day) =>
        Row(pad(450000 + i, 10), pad(10, 5), "1", "E", "101",
          f"2025-${i % 6 + 1}%02d$day", BigDecimal(q).setScale(3),
          BigDecimal(q * 26).setScale(2), "S")
      }
    }

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

    // ── remaining catalog tables (full-inventory coverage; name-keyed rows) ─
    val d1 = (x: Double) => BigDecimal(x).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    val d0 = (x: Double) => BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP)

    // company-code account views for the chart of accounts
    val skb1 = (0 until 5).map(i => rowFor("SKB1", Map(
      "BUKRS" -> "1000", "SAKNR" -> pad(400000 + i, 10), "WAERS" -> "USD",
      "XOPVW" -> (if (i % 2 == 0) "X" else ""), "MITKZ" -> "")))

    // invoice receipts (MIRO): RBKP headers over the PO vendors, RSEG lines
    // tied back to PO items — the P2P invoice leg
    val rbkp = (1 to 12).map { i =>
      rowFor("RBKP", Map(
        "BELNR" -> pad(510000 + i, 10), "GJAHR" -> "2025", "BLART" -> "RE",
        "BLDAT" -> f"2025-${i % 6 + 1}%02d-18", "BUDAT" -> f"2025-${i % 6 + 1}%02d-20",
        "XBLNR" -> s"INV-$i", "LIFNR" -> vendors((i % 10 + 1) % vendors.size)._1,
        "WAERS" -> "USD", "RMWWR" -> d2((i * 10 + 1) * 26 * 1.1),
        "WMWST1" -> d2((i * 10 + 1) * 26 * 0.1),
        "ZFBDT" -> f"2025-${i % 6 + 2}%02d-20", "ZTERM" -> "N30",
        "SGTXT" -> s"Invoice for PO ${pad(450000 + i % 10 + 1, 10)}",
        "STBLG" -> "", "BUKRS" -> "1000"))
    }
    val rseg = (1 to 12).map { i =>
      rowFor("RSEG", Map(
        "BELNR" -> pad(510000 + i, 10), "GJAHR" -> "2025", "BUZEI" -> "001",
        "EBELN" -> pad(450000 + i % 10 + 1, 10), "EBELP" -> pad(10, 5),
        "MATNR" -> s"MAT${pad((i % 10 + 1) * 10 + 1, 6)}", "MENGE" -> d3(i * 10 + 1),
        "BSTME" -> "EA", "WRBTR" -> d2((i * 10 + 1) * 26.0),
        "DMBTR" -> d2((i * 10 + 1) * 26.0), "MWSKZ" -> "V1", "BUKRS" -> "1000",
        "RETPO" -> "", "XBLNR" -> s"INV-$i", "LOEKZ" -> ""))
    }

    // cleared customer items (the BSID/BSAD open/cleared split)
    val bsad = (1 to 12).map { i =>
      val due = asOf.minusDays(120L + i)
      rowFor("BSAD", Map(
        "BUKRS" -> "1000", "KUNNR" -> customers(i % customers.size)._1,
        "AUGDT" -> due.plusDays(25).toString, "AUGBL" -> pad(9100 + i, 10),
        "GJAHR" -> "2025", "BELNR" -> pad(8200 + i, 10), "BUZEI" -> "001",
        "BUDAT" -> due.minusDays(30).toString, "BLDAT" -> due.minusDays(32).toString,
        "SHKZG" -> "S", "DMBTR" -> d2((i * 157 % 5000) + 150.0),
        "WRBTR" -> d2((i * 157 % 5000) + 150.0), "WAERS" -> "USD",
        "BSCHL" -> "01", "ZFBDT" -> due.toString, "SGTXT" -> s"Cleared invoice $i",
        "HKONT" -> pad(140000, 10), "ZUONR" -> "", "REBZG" -> "",
        "LOEKZ" -> "", "BLART" -> "DR", "KOART" -> "D", "XBLNR" -> s"AR-$i"))
    }

    // sales order items (2 per order; ABGRU marks a rejected line)
    val vbap = (1 to 12).flatMap { i =>
      (1 to 2).map { j =>
        rowFor("VBAP", Map(
          "VBELN" -> pad(600000 + i, 10), "POSNR" -> pad(j * 10, 6),
          "MATNR" -> s"MAT${pad(i % 10 * 10 + j, 6)}", "ARKTX" -> s"Item $j of order $i",
          "KWMENG" -> d3(i + j * 2.0), "VRKME" -> "EA",
          "NETWR" -> d2((i * 517 % 9000 + 500) / 2.0), "WAERK" -> "USD",
          "WERKS" -> "1000", "LGORT" -> "0001", "PSTYV" -> "TAN",
          "ABGRU" -> (if (i % 6 == 0 && j == 2) "01" else ""),
          "NETPR" -> BigDecimal((i * 517 % 9000 + 500) / 2.0 / (i + j * 2))
            .setScale(5, BigDecimal.RoundingMode.HALF_UP),
          "KPEIN" -> "001", "LOEKZ" -> ""))
      }
    }

    // delivery items referencing the originating order (VGBEL)
    val lips = (1 to 9).map { i =>
      rowFor("LIPS", Map(
        "VBELN" -> pad(800000 + i, 10), "POSNR" -> pad(10, 6),
        "MATNR" -> s"MAT${pad(i % 10 * 10 + 1, 6)}", "ARKTX" -> s"Delivered item $i",
        "LFIMG" -> d3(i + 2.0), "VRKME" -> "EA", "NETWR" -> d2(i * 100.0),
        "WERKS" -> "1000", "LGORT" -> "0001",
        "VGBEL" -> pad(600000 + i, 10), "VGPOS" -> pad(10, 6),
        "ERDAT" -> f"2025-${i % 6 + 1}%02d-08"))
    }

    // billing items referencing order (AUBEL) and delivery (VGBEL)
    val vbrp = (1 to 6).map { i =>
      rowFor("VBRP", Map(
        "VBELN" -> pad(900000 + i, 10), "POSNR" -> pad(10, 6),
        "FKIMG" -> d3(i + 2.0), "VRKME" -> "EA",
        "NETWR" -> d2(i * 517 % 9000 + 500.0), "MATNR" -> s"MAT${pad(i % 10 * 10 + 1, 6)}",
        "ARKTX" -> s"Billed item $i", "WERKS" -> "1000",
        "AUBEL" -> pad(600000 + i, 10), "AUPOS" -> pad(10, 6),
        "VGBEL" -> pad(800000 + i, 10), "VGPOS" -> pad(10, 6)))
    }

    // material master chain: MARA basics, MARC plant view, MARD stock, MAKT text
    val matnrs = (1 to 10).flatMap(i => (1 to 2).map(j => s"MAT${pad(i * 10 + j, 6)}"))
    val mara = matnrs.zipWithIndex.map { case (m, ix) =>
      rowFor("MARA", Map(
        "MATNR" -> m, "MTART" -> (if (ix % 2 == 0) "ROH" else "FERT"),
        "MBRSH" -> "M", "MATKL" -> pad(ix % 4 + 1, 9), "MEINS" -> "EA",
        "BRGEW" -> d3(ix + 1.5), "GEWEI" -> "KG", "NTGEW" -> d3(ix + 1.0),
        "EAN11" -> pad(4000000000L + ix, 13), "ERDAT" -> "2024-01-15",
        "ERNAM" -> "USER0", "LVORM" -> ""))
    }
    val marc = matnrs.zipWithIndex.map { case (m, ix) =>
      rowFor("MARC", Map(
        "MATNR" -> m, "WERKS" -> "1000", "EKGRP" -> pad(ix % 3 + 1, 3),
        "DISMM" -> "PD", "DISPO" -> "001", "BESKZ" -> "F",
        "LGPRO" -> "0001", "LGFSB" -> "0001", "PRCTR" -> pad(ix % 2 + 1, 10)))
    }
    val mard = matnrs.zipWithIndex.map { case (m, ix) =>
      rowFor("MARD", Map(
        "MATNR" -> m, "WERKS" -> "1000", "LGORT" -> "0001",
        "LABST" -> d3((ix * 37 % 500) + 10.0), "INSME" -> d3(0), "SPEME" -> d3(0),
        "EINME" -> d3(0), "RETME" -> d3(0)))
    }
    val makt = matnrs.zipWithIndex.flatMap { case (m, ix) => Seq(
      rowFor("MAKT", Map("MATNR" -> m, "SPRAS" -> "E", "MAKTX" -> s"Material $ix")),
      rowFor("MAKT", Map("MATNR" -> m, "SPRAS" -> "D", "MAKTX" -> s"Werkstoff $ix")))
    }

    // CO document headers for the COEP line items
    val cobk = (1 to 4).flatMap { cc =>
      (1 to 6).map { i =>
        rowFor("COBK", Map(
          "KOKRS" -> "1000", "BELNR" -> pad(cc * 1000 + i, 10), "GJAHR" -> "2025",
          "BLDAT" -> f"2025-${i % 6 + 1}%02d-09", "BUDAT" -> f"2025-${i % 6 + 1}%02d-10",
          "BLTXT" -> s"CO posting $i", "USNAM" -> s"USER${i % 3}", "VRGNG" -> "COIN"))
      }
    }
    // internal-activity totals (secondary cost elements), COSP's sibling
    val coss = (1 to 4).flatMap { cc =>
      Seq("04", "01").map { wt =>
        rowFor("COSS", Map("OBJNR" -> ("KS1000" + pad(cc, 10)), "GJAHR" -> "2025",
          "WRTTP" -> wt, "VERSN" -> "000", "KSTAR" -> pad(600000 + cc % 2, 10)) ++
          (1 to 12).map(p => f"WKG$p%03d" -> d2(cc * 20 + p * 3.0)).toMap)
      }
    }

    // PM chain: maintenance orders → order header (equipment) → op list →
    // operations (some cancelled) → confirmations; equipment + texts
    val equnrs = (1 to 5).map(e => s"EQ-${pad(e, 8)}")
    val aufk = (1 to 8).map { i =>
      rowFor("AUFK", Map(
        "AUFNR" -> pad(900000 + i, 12), "AUART" -> "01", "AUTYP" -> "30",
        "BUKRS" -> "1000", "KOKRS" -> "1000", "KOSTV" -> pad(i % 4 + 1, 10),
        "PRCTR" -> pad(i % 2 + 1, 10), "KTEXT" -> s"Repair order $i",
        "ERDAT" -> f"2025-${i % 6 + 1}%02d-02", "AEDAT" -> f"2025-${i % 6 + 1}%02d-05",
        "LOEKZ" -> (if (i == 8) "X" else ""), "STAT0" -> (if (i % 3 == 0) "TECO" else "REL").take(2),
        "WERKS" -> "1000", "ERNAM" -> s"USER${i % 3}",
        "OBJNR" -> ("OR" + pad(900000 + i, 12))))
    }
    val afih = (1 to 8).map { i =>
      rowFor("AFIH", Map(
        "AUFNR" -> pad(900000 + i, 12), "EQUNR" -> equnrs(i % equnrs.size),
        "TPLNR" -> s"PLANT-A-${pad(i % 3 + 1, 2)}", "ILART" -> pad(i % 2 + 1, 2),
        "PRIOK" -> s"${i % 3 + 1}", "IWERK" -> "1000", "INGPR" -> "001",
        "QMNUM" -> pad(700000 + i, 12), "IPHAS" -> "2",
        "GSTRP" -> f"2025-${i % 6 + 1}%02d-10", "GLTRP" -> f"2025-${i % 6 + 1}%02d-20",
        "GSTRI" -> (if (i <= 6) f"2025-${i % 6 + 1}%02d-11" else null),
        "GLTRI" -> (if (i <= 4) f"2025-${i % 6 + 1}%02d-19" else null)))
    }
    val afko = (1 to 8).map { i =>
      rowFor("AFKO", Map(
        "AUFNR" -> pad(900000 + i, 12), "AUFPL" -> pad(7000 + i, 10),
        "GSTRP" -> f"2025-${i % 6 + 1}%02d-10", "GLTRP" -> f"2025-${i % 6 + 1}%02d-20",
        "GSTRI" -> (if (i <= 6) f"2025-${i % 6 + 1}%02d-11" else null),
        "GLTRI" -> (if (i <= 4) f"2025-${i % 6 + 1}%02d-19" else null),
        "FTRMS" -> f"2025-${i % 6 + 1}%02d-08", "DESSION" -> "001"))
    }
    val afvc = (1 to 8).flatMap { i =>
      (1 to 3).map { op =>
        rowFor("AFVC", Map(
          "AUFPL" -> pad(7000 + i, 10), "APLZL" -> pad(op, 8),
          "VORNR" -> pad(op * 10, 4), "STEUS" -> "PM01",
          "LTXA1" -> s"Operation ${op * 10} of order $i", "ARBID" -> pad(op, 8),
          "WERKS" -> "1000", "ARBPL" -> (if (op % 2 == 0) "ELEC" else "MECH"),
          "ANZZL" -> d0(1), "USR00" -> "",
          "LOEKZ" -> (if ((i + op) % 4 == 0) "X" else "")))
      }
    }
    val afru = (1 to 8).flatMap { i =>
      (1 to 3).filter(op => (i + op) % 4 != 0).map { op =>
        rowFor("AFRU", Map(
          "RUECK" -> pad(i * 100 + op, 10), "RMZHL" -> pad(1, 4),
          "AUFNR" -> pad(900000 + i, 12), "VORNR" -> pad(op * 10, 4),
          "AUFPL" -> pad(7000 + i, 10), "APLZL" -> pad(op, 8), "WERKS" -> "1000",
          "BUDAT" -> f"2025-${i % 6 + 1}%02d-15", "ISMNW" -> d1(op * 1.5),
          "ISMNE" -> "H", "PERNR" -> pad(i % 12 + 1, 8), "STOKZ" -> "",
          "STZHL" -> pad(0, 4)))
      }
    }
    val equi = equnrs.zipWithIndex.map { case (eq, ix) =>
      rowFor("EQUI", Map(
        "EQUNR" -> eq, "EQTYP" -> "M", "EQART" -> s"PUMP${ix % 2}",
        "INBDT" -> "2022-03-01", "BUKRS" -> "1000", "WERKS" -> "1000",
        "STORT" -> s"ST${ix % 3}", "TPLNR" -> s"PLANT-A-${pad(ix % 3 + 1, 2)}",
        "HERST" -> s"Maker ${('A' + ix).toChar}", "SERGE" -> s"SN-$ix",
        "INVNR" -> pad(ix, 6), "GEWRK" -> "MECH", "LOESSION" -> ""))
    }
    val eqkt = equnrs.zipWithIndex.flatMap { case (eq, ix) => Seq(
      rowFor("EQKT", Map("EQUNR" -> eq, "SPRAS" -> "E", "EQKTX" -> s"Pump unit $ix")),
      rowFor("EQKT", Map("EQUNR" -> eq, "SPRAS" -> "D", "EQKTX" -> s"Pumpe $ix")))
    }
    val iflot = (1 to 3).map(i => rowFor("IFLOT", Map(
      "TPLNR" -> s"PLANT-A-${pad(i, 2)}", "FLTYP" -> "A", "IWERK" -> "1000",
      "BUKRS" -> "1000", "WERKS" -> "1000", "STORT" -> s"ST${i % 3}",
      "GEWRK" -> "MECH", "TPLMA" -> (if (i > 1) "PLANT-A-01" else ""))))
    val iflotx = (1 to 3).flatMap(i => Seq(
      rowFor("IFLOTX", Map("TPLNR" -> s"PLANT-A-${pad(i, 2)}", "SPRAS" -> "E",
        "PLTXT" -> s"Plant section $i")),
      rowFor("IFLOTX", Map("TPLNR" -> s"PLANT-A-${pad(i, 2)}", "SPRAS" -> "D",
        "PLTXT" -> s"Anlagenteil $i"))))

    // purchase requisitions: first 6 converted to POs, rest open
    val eban = (1 to 10).map { i =>
      rowFor("EBAN", Map(
        "BANFN" -> pad(300000 + i, 10), "BNFPO" -> pad(10, 5), "BSART" -> "NB",
        "BADAT" -> f"2025-${i % 6 + 1}%02d-01", "ERNAM" -> s"USER${i % 3}",
        "MATNR" -> s"MAT${pad(i * 10 + 1, 6)}", "TXZ01" -> s"Requisition $i",
        "MENGE" -> d3(i * 5.0), "MEINS" -> "EA", "PREIS" -> d2(25 + i),
        "EKGRP" -> pad(i % 3 + 1, 3), "WERKS" -> "1000", "LGORT" -> "0001",
        "FRGST" -> "1", "FRGKZ" -> "X", "LOEKZ" -> "",
        "EBELN" -> (if (i <= 6) pad(450000 + i, 10) else null),
        "EBELP" -> (if (i <= 6) pad(10, 5) else null)))
    }

    // company-code views of the partner masters
    val lfb1 = vendors.map(v => rowFor("LFB1", Map(
      "LIFNR" -> v._1, "BUKRS" -> "1000", "AKONT" -> pad(160000, 10),
      "ZTERM" -> "N30", "ZWELS" -> "T", "FDGRV" -> "A1", "SPERR" -> "", "LOEVM" -> "")))
    val knb1 = customers.map(cu => rowFor("KNB1", Map(
      "KUNNR" -> cu._1, "BUKRS" -> "1000", "AKONT" -> pad(140000, 10),
      "ZTERM" -> "N30", "ZWELS" -> "T", "FDGRV" -> "A2", "SPERR" -> "", "LOEVM" -> "")))

    // payment program results
    val reguh = (1 to 6).map(i => rowFor("REGUH", Map(
      "LAUFD" -> f"2025-${i % 6 + 1}%02d-25", "LAUFI" -> s"RUN$i",
      "ZBUKR" -> "1000", "LIFNR" -> vendors(i % vendors.size)._1,
      "VBLNR" -> pad(950000 + i, 10), "ZALDT" -> f"2025-${i % 6 + 1}%02d-28",
      "RWBTR" -> d2((i * 211 % 4000) + 50.0), "WAERS" -> "USD", "RZAWE" -> "T")))

    // HR/PAY/BEN detail (protected; yyyyMMdd dates per the date-format rule)
    val pa0006 = (1 to 12).map(i => rowFor("PA0006", Map(
      "PERNR" -> pad(i, 8), "BEGDA" -> "20200101", "ENDDA" -> "99991231",
      "ANSSA" -> "1", "STRAS" -> s"$i Main Street", "ORT01" -> "Springfield",
      "PSTLZ" -> pad(10000 + i, 5), "LAND1" -> "US", "TELF1" -> s"555-010$i")))
    val pa0008 = (1 to 12).map(i => rowFor("PA0008", Map(
      "PERNR" -> pad(i, 8), "BEGDA" -> "20200101", "ENDDA" -> "99991231",
      "TRFAR" -> "T1", "TRFGB" -> "01", "TRFGR" -> s"G${i % 3 + 1}",
      "TRFST" -> pad(i % 4 + 1, 2), "ANSAL" -> d2(50000 + i * 2500.0),
      "WAERS" -> "USD", "LGA01" -> "1000", "BET01" -> d2(4000 + i * 200.0),
      "LGA02" -> "1010", "BET02" -> d2(200 + i * 10.0))))
    val pa0014 = (1 to 12).map(i => rowFor("PA0014", Map(
      "PERNR" -> pad(i, 8), "BEGDA" -> "20200101", "ENDDA" -> "99991231",
      "LGART" -> (if (i % 2 == 0) "1000" else "2000"), "BETRG" -> d2(100 + i * 5.0),
      "WAERS" -> "USD", "ANZHL" -> pad(12, 2))))
    val ben = (1 to 12).map { i =>
      val cat = if (i % 3 == 0) "HE" else "RE"
      (rowFor("PA0167", Map("PERNR" -> pad(i, 8), "BEGDA" -> "20200101",
        "ENDDA" -> "99991231", "BESSION" -> s"PLAN${i % 2}", "BESSION_CAT" -> cat,
        "BESSION_TYPE" -> "A")),
        rowFor("PA0168", Map("PERNR" -> pad(i, 8), "BEGDA" -> "20200101",
          "ENDDA" -> "99991231", "BESSION" -> s"PLAN${i % 2}", "BESSION_CAT" -> cat,
          "BESSION_TYPE" -> "A", "COVAM" -> d2(100000 + i * 1000.0))),
        rowFor("PA0169", Map("PERNR" -> pad(i, 8), "BEGDA" -> "20200101",
          "ENDDA" -> "99991231", "BESSION" -> s"PLAN${i % 2}", "BESSION_CAT" -> cat,
          "BESSION_TYPE" -> "A",
          "EECON" -> BigDecimal(i % 5 + 2).setScale(2),
          "ERCON" -> BigDecimal(i % 3 + 4).setScale(2))))
    }
    val t511 = Seq("1000", "1010", "2000").map(lg =>
      rowFor("T511", Map("MOLGA" -> "10", "LGART" -> lg)))
    val t512t = Seq("1000" -> "Base salary", "1010" -> "Bonus", "2000" -> "Overtime")
      .flatMap { case (lg, tx) => Seq(
        rowFor("T512T", Map("MOLGA" -> "10", "LGART" -> lg, "SPRAS" -> "E", "LGTXT" -> tx)),
        rowFor("T512T", Map("MOLGA" -> "10", "LGART" -> lg, "SPRAS" -> "D", "LGTXT" -> s"$tx (DE)")))
      }

    val data: Map[String, Seq[Row]] = Map(
      "BKPF" -> bkpf, "BSEG" -> bseg, "GLT0" -> glt0, "SKA1" -> ska1,
      "SKAT" -> skat, "LFA1" -> lfa1, "KNA1" -> kna1, "BSIK" -> bsik,
      "BSAK" -> bsak, "BSID" -> bsid, "EKKO" -> ekko, "EKPO" -> ekpo,
      "EKBE" -> ekbe, "VBAK" -> vbak, "LIKP" -> likp, "VBRK" -> vbrk,
      "VBFA" -> vbfa, "CSKS" -> csks, "COEP" -> coep, "COSP" -> cosp,
      "PA0001" -> pa0001, "PA0002" -> pa0002, "HRPY_RGDIR" -> hrpy,
      "SKB1" -> skb1, "RBKP" -> rbkp, "RSEG" -> rseg, "BSAD" -> bsad,
      "VBAP" -> vbap, "LIPS" -> lips, "VBRP" -> vbrp, "MARA" -> mara,
      "MARC" -> marc, "MARD" -> mard, "MAKT" -> makt, "COBK" -> cobk,
      "COSS" -> coss, "AUFK" -> aufk, "AFIH" -> afih, "AFKO" -> afko,
      "AFVC" -> afvc, "AFRU" -> afru, "EQUI" -> equi, "EQKT" -> eqkt,
      "IFLOT" -> iflot, "IFLOTX" -> iflotx, "EBAN" -> eban, "LFB1" -> lfb1,
      "KNB1" -> knb1, "REGUH" -> reguh, "PA0006" -> pa0006, "PA0008" -> pa0008,
      "PA0014" -> pa0014, "PA0167" -> ben.map(_._1), "PA0168" -> ben.map(_._2),
      "PA0169" -> ben.map(_._3), "T511" -> t511, "T512T" -> t512t)

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
