package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HANA/ANSI/Oracle-compat SQL front end — the Spark inversion of the
  * reference's `sap_to_sqlite_sql` translator (SURVEY §2.6,
  * sap_sql_engine.py:961-1199). Most of the reference's rewrites are Spark
  * built-ins already; what remains is
  *   1. a light string pre-rewrite for syntax Spark's parser rejects
  *      (`SELECT TOP n`, `FETCH FIRST n ROWS ONLY`, `ROWNUM <= n`, comment
  *      stripping, multi-statement → last SELECT/WITH), and
  *   2. session-registered HANA function aliases (ADD_DAYS, DAYS_BETWEEN,
  *      TO_VARCHAR, SYSDATE, JULIANDAY, …) built from Spark expressions so
  *      they stay codegen'd.
  */
object HanaDialect {

  // ── 1. string pre-rewriter ────────────────────────────────────────────

  /** Strip SQL comments (line and block), preserving string literals. */
  def stripComments(sql: String): String = {
    val noBlock = raw"/\*[\s\S]*?\*/".r.replaceAllIn(sql, " ")
    noBlock.linesIterator.map { line =>
      var inStr = false
      val sb = new StringBuilder
      var i = 0
      while (i < line.length) {
        val ch = line.charAt(i)
        if (ch == '\'') { inStr = !inStr; sb += ch; i += 1 }
        else if (!inStr && ch == '-' && i + 1 < line.length && line.charAt(i + 1) == '-') {
          i = line.length
        } else { sb += ch; i += 1 }
      }
      sb.toString
    }.mkString("\n")
  }

  /** Keep only the last SELECT/WITH statement of a multi-statement script
    * (reference behavior, sap_sql_engine.py:969-999). */
  def lastSelect(sql: String): String = {
    val stmts = sql.split(";").map(_.trim).filter(_.nonEmpty)
    stmts.reverse.find(s => {
      val u = s.toUpperCase
      u.startsWith("SELECT") || u.startsWith("WITH")
    }).getOrElse(stmts.lastOption.getOrElse(sql))
  }

  /** `SELECT TOP n …` → `SELECT … LIMIT n` (HANA/T-SQL form). Handles the
    * statement head AND a CTE-prefixed main select (`WITH x AS (…) SELECT
    * TOP n …`): the rewrite targets the last `SELECT TOP` at paren depth 0,
    * so a TOP inside a CTE body is left for its own scope. */
  def rewriteTop(sql: String): String = {
    val Top = raw"(?is)SELECT\s+TOP\s+(\d+)\s+".r
    // depth-0, outside-string-literal positions only
    var depth = 0; var inStr = false
    val depth0 = Array.fill(sql.length)(false)
    for (i <- sql.indices) {
      val ch = sql.charAt(i)
      if (ch == '\'') inStr = !inStr
      else if (!inStr && ch == '(') depth += 1
      else if (!inStr && ch == ')') depth -= 1
      depth0(i) = !inStr && depth == 0
    }
    Top.findAllMatchIn(sql).toSeq.filter(m => depth0(m.start)).lastOption match {
      case Some(m) =>
        val without = sql.substring(0, m.start) + "SELECT " + sql.substring(m.end)
        if (raw"(?is)\bLIMIT\s+\d+\s*$$".r.findFirstIn(without).isDefined) without
        else s"$without LIMIT ${m.group(1)}"
      case None => sql
    }
  }

  /** `FETCH FIRST n ROWS ONLY` → `LIMIT n` (ANSI/DB2/Oracle 12c form). */
  def rewriteFetchFirst(sql: String): String =
    raw"(?i)FETCH\s+FIRST\s+(\d+)\s+ROWS?\s+ONLY".r
      .replaceAllIn(sql, m => s"LIMIT ${m.group(1)}")

  /** Drop Oracle `ROWNUM <= n` predicates, appending a LIMIT instead. */
  def rewriteRownum(sql: String): String = {
    val R = raw"(?i)(?:AND\s+)?ROWNUM\s*<=?\s*(\d+)".r
    R.findFirstMatchIn(sql) match {
      case Some(m) =>
        val stripped = R.replaceAllIn(sql, "")
          .replaceAll(raw"(?i)WHERE\s+(AND\s+|ORDER|GROUP|LIMIT|$$)", "$1")
        s"$stripped LIMIT ${m.group(1)}"
      case None => sql
    }
  }

  /** Full pre-rewrite pipeline. */
  def rewrite(sql: String): String =
    rewriteRownum(rewriteFetchFirst(rewriteTop(lastSelect(stripComments(sql))))).trim

  // ── 2. HANA function registration ─────────────────────────────────────

  // once-per-session guard (weak keys): `sql` below installs on every
  // statement, and re-registration would log a registry warning per function
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register the HANA-compat functions on a session (idempotent — repeat
    * calls are no-ops). Each is a thin Expression builder over Spark
    * built-ins — full codegen, no UDFs. */
  def install(spark: SparkSession): Unit = {
    if (installed.put(spark, java.lang.Boolean.TRUE) != null) return
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val reg = spark.sessionState.functionRegistry

    def register(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")

    // ADD_DAYS(d, n) — HANA; Spark has date_add
    register("add_days")(e => DateAdd(Cast(e(0), DateType), e(1)))
    // DAYS_BETWEEN(a, b) = a - b in days (reference: julianday(a)-julianday(b))
    register("days_between")(e =>
      DateDiff(Cast(e(0), DateType), Cast(e(1), DateType)))
    // 3-arg DATEDIFF(unit, a, b) — HANA/T-SQL; day unit = b - a
    register("datediff3")(e =>
      DateDiff(Cast(e(2), DateType), Cast(e(1), DateType)))
    // TO_VARCHAR(x) / TO_VARCHAR(x, fmt) with HANA→JVM format-token mapping;
    // TO_CHAR is the Oracle spelling of the same surface
    val toVarchar: Seq[Expression] => Expression = {
      case Seq(x) => Cast(x, StringType)
      case Seq(x, Literal(fmt, StringType)) =>
        DateFormatClass(Cast(x, TimestampType), Literal(mapFormat(fmt.toString)))
      case e => Cast(e.head, StringType)
    }
    register("to_varchar")(toVarchar)
    register("to_char")(toVarchar)
    // strftime(fmt, x) — SQLite-ism the reference templates call directly;
    // %-token map → JVM DateTimeFormatter
    register("strftime") {
      case Seq(Literal(fmt, StringType), x) =>
        DateFormatClass(Cast(x, TimestampType), Literal(mapStrftime(fmt.toString)))
      case e => Cast(e.head, StringType)
    }
    // TO_NUMBER / TO_INTEGER
    register("to_number")(e => Cast(e.head, DecimalType(38, 6)))
    register("to_integer")(e => Cast(e.head, LongType))
    // SYSDATE (Oracle)
    register("sysdate")(_ => CurrentDate())
    // JULIANDAY(x) — SQLite-ism used by reference templates; days since the
    // julian epoch = unix days + 2440587.5
    register("julianday")(e => Add(
      Cast(DateDiff(Cast(e.head, DateType), Literal.create(
        java.time.LocalDate.of(1970, 1, 1).toEpochDay.toInt, DateType)), DoubleType),
      Literal(2440587.5)))
    // LAST_DAY alias for HANA's LAST_DAY is native; MONTHS_BETWEEN native.
  }

  /** SQLite strftime %-tokens → JVM DateTimeFormatter tokens. */
  def mapStrftime(fmt: String): String =
    fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
      .replace("%j", "DDD")

  /** HANA/Oracle date-format tokens → JVM DateTimeFormatter tokens. */
  def mapFormat(fmt: String): String =
    fmt.replace("YYYY", "yyyy").replace("YY", "yy")
      .replace("DD", "dd")
      .replace("HH24", "HH").replace("HH12", "hh")
      .replace("MI", "mm").replace("SS", "ss")
      .replace("MON", "MMM")

  /** Parse + run a HANA-dialect SQL string on the session (rewrite →
    * register functions → spark.sql). The Catalyst analyzer replaces the
    * reference's entire translate-then-execute layer. */
  def sql(spark: SparkSession, hanaSql: String): DataFrame = {
    install(spark)
    // the engine's native kernels ride the same execute path, so CLI and
    // /api/execute SQL can call simhash64/minhash_sig/… without the
    // session extension being configured
    graft.functions.GraftFunctions.install(spark)
    spark.sql(rewrite(hanaSql))
  }
}
