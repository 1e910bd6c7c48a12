package graft.graph

import scala.collection.mutable

import graft.model.{Catalog, SemanticModel}

/** NL-resolution + join-path knowledge graph (SURVEY §2.9) — the Scala
  * realization of the reference's NetworkX MultiDiGraph
  * (`sap_knowledge_graph.py`): module/table/concept/NL-term nodes;
  * belongs-to / foreign-key / describes / synonym edges. At 240-node scale a
  * plain adjacency map beats any distributed graph machinery.
  */
final class KnowledgeGraph(model: SemanticModel) {

  sealed trait Node { def id: String }
  final case class ModuleNode(id: String) extends Node
  final case class TableNode(id: String) extends Node
  final case class ConceptNode(id: String) extends Node
  final case class TermNode(id: String) extends Node

  /** table → neighbors over declared FK relationships (undirected for path
    * discovery, like the reference's join-path search). */
  val fkAdjacency: Map[String, Seq[String]] = {
    val m = mutable.Map.empty[String, mutable.ListBuffer[String]]
    model.relationships.foreach { r =>
      m.getOrElseUpdate(r.fromTable, mutable.ListBuffer()) += r.toTable
      m.getOrElseUpdate(r.toTable, mutable.ListBuffer()) += r.fromTable
    }
    m.view.mapValues(_.distinct.toSeq).toMap
  }

  /** NL term → tables (from table + business-object aliases, lowercased). */
  val termIndex: Map[String, Seq[String]] = {
    val m = mutable.Map.empty[String, mutable.ListBuffer[String]]
    model.tables.foreach { t =>
      (t.name.toLowerCase +: t.nlAliases.map(_.toLowerCase)).foreach { a =>
        m.getOrElseUpdate(a, mutable.ListBuffer()) += t.name
      }
    }
    model.businessObjects.foreach { bo =>
      bo.nlAliases.map(_.toLowerCase).foreach { a =>
        m.getOrElseUpdate(a, mutable.ListBuffer()) ++= bo.tables
      }
    }
    m.view.mapValues(_.distinct.toSeq).toMap
  }

  def nodeCount: Int =
    model.modules.size + model.tables.size + model.businessObjects.size + termIndex.size

  def edgeCount: Int = model.relationships.size + termIndex.valuesIterator.map(_.size).sum

  /** Exact index hit, else substring fuzzy (reference resolve_nl_term,
    * sap_knowledge_graph.py:505-531). */
  def resolveTerm(term: String): Seq[String] = {
    val t = term.toLowerCase.trim
    termIndex.getOrElse(t,
      termIndex.collect { case (k, v) if k.contains(t) || t.contains(k) => v }
        .flatten.toSeq.distinct)
  }

  private val stopwords = Set("the", "a", "an", "of", "for", "in", "on", "to",
    "show", "me", "all", "list", "what", "which", "how", "many", "by", "and",
    "with", "top", "is", "are")

  /** Tokenize, drop stopwords, resolve each remaining term + bigram
    * (reference resolve_question, sap_knowledge_graph.py:533-578). */
  def resolveQuestion(question: String): Seq[String] = {
    val toks = question.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .split("\\s+").filter(t => t.nonEmpty && !stopwords.contains(t)).toSeq
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    (bigrams ++ toks).flatMap(resolveTerm).distinct
  }

  /** BFS shortest join path between two tables (reference find_join_path). */
  def findJoinPath(from: String, to: String): Option[Seq[String]] = {
    if (from == to) return Some(Seq(from))
    val prev = mutable.Map.empty[String, String]
    val q = mutable.Queue(from)
    val seen = mutable.Set(from)
    while (q.nonEmpty) {
      val cur = q.dequeue()
      for (nb <- fkAdjacency.getOrElse(cur, Nil) if !seen.contains(nb)) {
        seen += nb; prev(nb) = cur
        if (nb == to) {
          val path = mutable.ListBuffer(to)
          while (path.head != from) path.prepend(prev(path.head))
          return Some(path.toSeq)
        }
        q.enqueue(nb)
      }
    }
    None
  }

  /** All simple paths with cutoff 4 hops, max 5 results (reference
    * find_all_join_paths, sap_knowledge_graph.py:603-626). */
  def findAllJoinPaths(from: String, to: String,
      cutoff: Int = 4, maxPaths: Int = 5): Seq[Seq[String]] = {
    val out = mutable.ListBuffer.empty[Seq[String]]
    def dfs(cur: String, path: List[String]): Unit = {
      if (out.size >= maxPaths) return
      if (cur == to) { out += path.reverse; return }
      if (path.size > cutoff) return
      for (nb <- fkAdjacency.getOrElse(cur, Nil) if !path.contains(nb))
        dfs(nb, nb :: path)
    }
    dfs(from, List(from))
    out.toSeq
  }

  /** Join condition SQL for an adjacent table pair, if declared. */
  def joinCondition(a: String, b: String): Option[String] =
    model.relationships.collectFirst {
      case r if r.fromTable == a && r.toTable == b => r.conditionSql
      case r if r.fromTable == b && r.toTable == a => r.conditionSql
    }

  /** Render a full join chain for a path (feeds generated SQL). */
  def joinChainSql(path: Seq[String]): Option[String] =
    if (path.size < 2) Some(path.mkString)
    else {
      val conds = path.sliding(2).map { case Seq(a, b) => joinCondition(a, b) }.toSeq
      if (conds.exists(_.isEmpty)) None
      else Some(path.head + path.tail.zip(conds.flatten)
        .map { case (t, c) => s" JOIN $t ON $c" }.mkString)
    }
}

object KnowledgeGraph {
  lazy val default: KnowledgeGraph = new KnowledgeGraph(Catalog.Model)
}
