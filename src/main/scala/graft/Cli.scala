package graft

import org.apache.spark.sql.SparkSession

import graft.intent.{AnswerPipeline, ExampleQuestions}
import graft.pipeline.ResultEnvelope
import graft.server.ApiServer

/** Interactive CLI / REPL (SURVEY §3.2 — reference `main` + REPL,
  * sap_sql_engine.py:1757-1913): numbered example selection and the
  * `examples` / `key` / `export` / `web` commands, plus `-q "question"`
  * one-shot mode. Questions route through the deterministic
  * [[graft.intent.AnswerPipeline]]; raw SQL executes directly.
  *
  * The loop logic lives in [[handleLine]] (pure apart from Spark execution)
  * so ScalaTest drives it without stdin.
  */
object Cli {

  final case class State(
      last: Option[ResultEnvelope] = None,
      serverPort: Option[Int] = None)

  private def renderTable(env: ResultEnvelope, maxShow: Int = 10): String = {
    val header = env.columns.mkString(" | ")
    val rows = env.rows.take(maxShow)
      .map(_.map(v => if (v == null) "NULL" else v.toString).mkString(" | "))
    val more =
      if (env.rowCount > maxShow) s"\n… ${env.rowCount - maxShow} more rows"
      else ""
    s"$header\n${"-" * header.length}\n${rows.mkString("\n")}$more"
  }

  /** One REPL interaction: (state, input line) → (new state, output). */
  def handleLine(spark: SparkSession, state: State, line: String): (State, String) = {
    val input = line.trim
    input.toLowerCase match {
      case "" => (state, "")
      case "examples" =>
        val listing = ExampleQuestions.all.zipWithIndex
          .map { case ((mod, q), i) => f"${i + 1}%2d. [$mod] $q" }
        (state, listing.mkString("\n"))
      case n if n.forall(_.isDigit) && n.nonEmpty =>
        val i = n.toInt
        if (i < 1 || i > ExampleQuestions.all.size)
          (state, s"pick 1..${ExampleQuestions.all.size} (see `examples`)")
        else handleLine(spark, state, ExampleQuestions.all(i - 1)._2)
      case k if k == "key" || k.startsWith("key ") =>
        (state, "No API key needed: classification and validated-pattern " +
          "routing are deterministic here. An LLM-backed IntentClassifier " +
          "can be plugged in for free-form SQL generation (SURVEY §2.10).")
      case e if e.startsWith("export") =>
        val path = input.split("\\s+", 2) match {
          case Array(_, p) => p
          case _ => "graft_export.csv"
        }
        state.last match {
          case None => (state, "nothing to export — run a query first")
          case Some(env) =>
            val w = new java.io.PrintWriter(path, "UTF-8")
            try {
              w.println(env.columns.mkString(","))
              env.rows.foreach(r => w.println(r.map {
                case null => ""
                case v if v.toString.contains(",") => "\"" + v + "\""
                case v => v.toString
              }.mkString(",")))
            } finally w.close()
            (state, s"wrote ${env.rowCount} rows to $path")
        }
      case w if w == "web" || w.startsWith("web ") =>
        state.serverPort match {
          case Some(p) => (state, s"web API already running on port $p")
          case None =>
            val port = input.split("\\s+", 2) match {
              case Array(_, p) if p.forall(_.isDigit) => p.toInt
              case _ => 0
            }
            val server = ApiServer.start(spark, port)
            val actual = server.getAddress.getPort
            (state.copy(serverPort = Some(actual)),
              s"web API listening on http://localhost:$actual (POST /api/execute, /api/classify, GET /api/kg/*)")
        }
      case "help" =>
        (state, """commands:
          |  examples       list the 27 example questions
          |  <number>       run example N
          |  key            LLM-key note (deterministic engine needs none)
          |  export [path]  write the last result as CSV
          |  web [port]     start the HTTP API
          |  quit           exit
          |anything else is answered as a question or executed as SQL.""".stripMargin)
      case _ =>
        val ans = AnswerPipeline.answer(spark, input)
        val body = ans.envelope match {
          case Some(env) => s"${ans.message}\n${renderTable(env)}"
          case None => ans.message
        }
        (state.copy(last = ans.envelope.orElse(state.last)), body)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.session("graft-cli", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.data.SapFixtures.register(spark)

    val qIdx = args.indexOf("-q")
    if (qIdx >= 0 && qIdx + 1 < args.length) {
      println(handleLine(spark, State(), args(qIdx + 1))._2)
    } else {
      println("graft SQL engine — type `help` for commands, `quit` to exit")
      var state = State()
      var running = true
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      while (running) {
        print("graft> "); Console.flush()
        Option(in.readLine()).map(_.trim) match {
          case None | Some("quit") | Some("exit") => running = false
          case Some(line) =>
            val (next, out) = handleLine(spark, state, line)
            state = next
            if (out.nonEmpty) println(out)
        }
      }
    }
    spark.stop()
  }
}
