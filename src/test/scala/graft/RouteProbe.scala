package graft

import graft.intent.{AnswerPipeline, HeuristicClassifier}

/** Routing probe (test-scope tool, the DebugExplain pattern): print the
  * classify + bestPattern decision for each question given as an arg —
  * the fastest way to audit a candidate q_nl_* phrasing before pinning it
  * in NlFaces/ParaphraseFuzzSpec. */
object RouteProbe {
  def main(args: Array[String]): Unit =
    args.foreach { q =>
      val c = HeuristicClassifier.classify(q)
      println(s"[probe] conf=${c.confidence} " +
        s"scored=${AnswerPipeline.bestPatternScored(q)} " +
        s"route=${AnswerPipeline.routeDecision(q, c)} '$q'")
    }
}
