package graft.graph

import scala.collection.mutable

import graft.model.{Catalog, SemanticModel}

/** NL-resolution + join-path knowledge graph (SURVEY §2.9) — the Scala
  * realization of the reference's NetworkX MultiDiGraph
  * (`sap_knowledge_graph.py`): module/table/concept/NL-term nodes;
  * belongs-to / describes / synonym / foreign-key edges. At 240-node scale a
  * plain adjacency map beats any distributed graph machinery.
  *
  * Node and edge construction mirrors the reference `_build_graph`
  * (sap_knowledge_graph.py:110-282) so the stats line up: one table node per
  * distinct table (first module wins), one concept node per business object,
  * one term node per distinct lowercased alias; edges keep MultiDiGraph
  * semantics (parallel edges count separately).
  */
final class KnowledgeGraph(model: SemanticModel) {

  sealed trait NodeType
  case object ModuleNode extends NodeType
  case object TableNode extends NodeType
  case object ConceptNode extends NodeType
  case object TermNode extends NodeType

  final case class Node(id: String, nodeType: NodeType, label: String,
      module: String = "", description: String = "")
  final case class Edge(from: String, to: String, edgeType: String,
      description: String = "", joinCondition: String = "")

  private def conceptId(module: String, name: String) = s"concept:${module}_$name"

  val nodes: Seq[Node] = {
    val modules = model.moduleDetails match {
      case Nil => model.modules.map(m => Node(s"mod:$m", ModuleNode, m, m))
      case ds => ds.map(d => Node(s"mod:${d.key}", ModuleNode,
        s"${d.key} — ${d.name}", d.key, d.description))
    }
    val tables = model.tables.map(t =>
      Node(s"tbl:${t.name}", TableNode, t.name, t.module, t.description))
    val concepts = model.businessObjects.map(bo =>
      Node(conceptId(bo.module, bo.name), ConceptNode,
        bo.name.replace('_', ' '), bo.module, bo.description))
    val terms = model.businessObjects
      .flatMap(bo => bo.nlAliases.map(_.toLowerCase)).distinct
      .map(a => Node(s"nlterm:$a", TermNode, a))
    modules ++ tables ++ concepts ++ terms
  }

  val edges: Seq[Edge] = {
    val present = model.tables.map(_.name).toSet
    val belongs = model.tables.map(t =>
      Edge(s"tbl:${t.name}", s"mod:${t.module}", "belongs_to"))
    val describes = model.businessObjects.flatMap(bo =>
      bo.tables.filter(present.contains).map(t =>
        Edge(conceptId(bo.module, bo.name), s"tbl:$t", "describes")))
    val synonyms = model.businessObjects.flatMap(bo =>
      bo.nlAliases.map(a =>
        Edge(s"nlterm:${a.toLowerCase}", conceptId(bo.module, bo.name), "synonym")))
    val cross = if (model.crossRelationships.nonEmpty) model.crossRelationships
      else model.relationships
    val fks = cross
      .filter(r => present.contains(r.fromTable) && present.contains(r.toTable))
      .map(r => Edge(s"tbl:${r.fromTable}", s"tbl:${r.toTable}", "foreign_key",
        r.description, r.conditionSql))
    belongs ++ describes ++ synonyms ++ fks
  }

  lazy val nodeById: Map[String, Node] = nodes.map(n => n.id -> n).toMap

  def nodeCount: Int = nodes.size
  def edgeCount: Int = edges.size

  /** Reference `stats` (sap_knowledge_graph.py:302-324). */
  def stats: Map[String, Int] = Map(
    "total_nodes" -> nodes.size,
    "total_edges" -> edges.size,
    "modules" -> nodes.count(_.nodeType == ModuleNode),
    "tables" -> nodes.count(_.nodeType == TableNode),
    "concepts" -> nodes.count(_.nodeType == ConceptNode),
    "nl_terms" -> nodes.count(_.nodeType == TermNode))

  /** table → neighbors over declared join relationships (undirected for path
    * discovery, like the reference's join-path search). */
  val fkAdjacency: Map[String, Seq[String]] = {
    val m = mutable.Map.empty[String, mutable.ListBuffer[String]]
    model.relationships.foreach { r =>
      m.getOrElseUpdate(r.fromTable, mutable.ListBuffer()) += r.toTable
      m.getOrElseUpdate(r.toTable, mutable.ListBuffer()) += r.fromTable
    }
    m.view.mapValues(_.distinct.toSeq).toMap
  }

  /** NL term → tables (from table names/aliases + business-object aliases,
    * lowercased). Richer than the node set — used for resolution only. */
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

  // ── explorer surface (reference sap_knowledge_graph.py:326-503) ─────────

  final case class Subgraph(nodes: Seq[Node], links: Seq[Edge])

  /** D3 force-directed export: module/table/concept nodes (NL terms
    * excluded) + edges between included nodes (reference to_d3_json). */
  def toD3: Subgraph = {
    val keep = nodes.filter(_.nodeType != TermNode)
    val ids = keep.map(_.id).toSet
    Subgraph(keep, edges.filter(e => ids.contains(e.from) && ids.contains(e.to)))
  }

  /** Concept detail + the tables it describes (reference get_concept_schema). */
  def conceptSchema(conceptName: String)
      : Option[(graft.model.BusinessObject, Seq[graft.model.SapTable])] =
    model.businessObjects.find(_.name.equalsIgnoreCase(conceptName)).map { bo =>
      bo -> bo.tables.flatMap(t => model.tableByName.get(t.toUpperCase))
    }

  /** Table context: module, describing concepts, outgoing FK partners
    * (reference get_table_context — partner direction follows the declared
    * relationship, as in the reference's directed successors). */
  def tableContext(tableName: String)
      : Option[(graft.model.SapTable, Seq[graft.model.BusinessObject], Seq[String])] =
    model.tableByName.get(tableName.toUpperCase).map { t =>
      val concepts = model.businessObjects.filter(_.tables.contains(t.name))
      val partners = edges.collect {
        case e if e.edgeType == "foreign_key" && e.from == s"tbl:${t.name}" =>
          e.to.stripPrefix("tbl:")
      }.distinct
      (t, concepts, partners)
    }

  /** Module subgraph: that module's table + concept nodes and the edges
    * among them (reference get_module_graph). */
  def moduleGraph(moduleCode: String): Subgraph = {
    val keep = nodes.filter(n =>
      (n.nodeType == TableNode || n.nodeType == ConceptNode) && n.module == moduleCode)
    val ids = keep.map(_.id).toSet
    Subgraph(keep, edges.filter(e => ids.contains(e.from) && ids.contains(e.to)))
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
