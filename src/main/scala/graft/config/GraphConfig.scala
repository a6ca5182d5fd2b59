package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Declarative graph-build configuration — the engine's "query language".
  *
  * Grammar mirrors the reference's YAML spec
  * (reference: examples/comptox_ai/config.yml:1-54, parsed at
  * graph_db_builder.py:545-549 / :292-329): a `Database` header, named
  * `Sources`, `Nodes` (per label, per source: table + id_key + uri_key) and
  * `Relationships` in two construction modes — `foreign_key` (equi-join
  * between two node source tables) and `join_table` (many-to-many edge
  * table). We additionally allow flat-file source types (parquet/csv/json),
  * which the reference declared but never implemented
  * (graph_db_builder.py:14, :193-194, :320-321).
  */
final case class DatabaseMeta(
    name: String,
    version: String,
    author: Option[String],
    website: Option[String],
    repository: Option[String]) {
  /** Output naming contract — reference: graph_db_builder.py:153
    * ("{name}-{version}.h5"); here a directory stem instead of HDF5. */
  def outputStem: String = s"$name-$version"
}

/** A named data source. `sourceType` ∈ {parquet, csv, json, jdbc}. */
final case class SourceConf(
    name: String,
    sourceType: String,
    path: String,
    options: Map[String, String] = Map.empty)

/** One source feeding one node label — reference: config.yml:14-33. */
final case class NodeSourceConf(
    source: String,
    table: String,
    idKey: String,
    uriKey: Option[String])

final case class NodeConf(
    label: String,
    idKeyLabel: Option[String],
    sources: Seq[NodeSourceConf])

/** Relationship construction modes — reference: config.yml:35-54. */
sealed trait RelMode
/** Equi-join between two node source tables on a shared key
  * (config.yml:39-47). `startProps`/`endProps` name columns from either
  * join side to carry onto the edge as relationship properties (an engine
  * extension — the reference grammar never exposed edge properties). */
final case class ForeignKeyMode(
    startNode: String, startTable: String, startKey: String,
    endNode: String, endTable: String, endKey: String,
    startProps: Seq[String] = Nil, endProps: Seq[String] = Nil) extends RelMode
/** Many-to-many edge table scan (config.yml:48-54). `props` names columns
  * of the join table to carry onto each edge as relationship properties
  * (engine extension, symmetric with [[ForeignKeyMode]]'s props). */
final case class JoinTableMode(
    table: String, fromField: String, toField: String,
    props: Seq[String] = Nil) extends RelMode

final case class RelSourceConf(source: String, mode: RelMode)

final case class RelConf(
    label: String,
    startNode: Option[String],
    endNode: Option[String],
    sources: Seq[RelSourceConf])

final case class GraphConfig(
    database: DatabaseMeta,
    sources: Map[String, SourceConf],
    nodes: Seq[NodeConf],
    relationships: Seq[RelConf]) {

  /** Cross-reference validation with actionable errors — the reference
    * validated only the presence of top-level keys
    * (graph_db_builder.py:295-300) and failed later with KeyErrors on
    * dangling references; we fail fast at parse time instead. Returns this
    * config for chaining. */
  def validated: GraphConfig = {
    val errors = Seq.newBuilder[String]
    val nodeLabels = nodes.map(_.label).toSet
    for (n <- nodes; s <- n.sources if !sources.contains(s.source))
      errors += s"node '${n.label}' references unknown source '${s.source}'"
    if (nodes.isEmpty) errors += "config declares no nodes"
    for (r <- relationships; rs <- r.sources) {
      if (!sources.contains(rs.source))
        errors += s"relationship '${r.label}' references unknown source '${rs.source}'"
      rs.mode match {
        case fk: ForeignKeyMode =>
          for (l <- Seq(fk.startNode, fk.endNode) if !nodeLabels.contains(l))
            errors += s"relationship '${r.label}' references unknown node '$l'"
        case _: JoinTableMode =>
          for (l <- r.startNode.toSeq ++ r.endNode.toSeq
               if !nodeLabels.contains(l))
            errors += s"relationship '${r.label}' references unknown node '$l'"
      }
    }
    val errs = errors.result()
    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        "invalid graph config:\n  " + errs.mkString("\n  "))
    this
  }
}

object GraphConfig {

  def fromFile(path: String): GraphConfig =
    fromYaml(Files.readString(Paths.get(path)))

  /** Parse the YAML grammar with snakeyaml (ships in /opt/spark/jars).
    * Driver-side metadata work only — no Spark involvement. */
  def fromYaml(yamlText: String): GraphConfig = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yamlText)
      .asScala.toMap

    // Insertion-ordered view of a YAML mapping. snakeyaml parses mappings
    // into LinkedHashMap, so iterating the java map directly preserves the
    // order sources appear in the config — which IS the merge-precedence
    // contract ("first source in config wins", NodePipeline A2). Never
    // collapse this to an unordered Map before sequencing.
    def asPairs(o: Object): Seq[(String, Object)] = o match {
      case null => Nil
      case m: java.util.Map[_, _] =>
        m.asScala.toSeq.map { case (k, v) =>
          k.toString -> v.asInstanceOf[Object]
        }
      case other =>
        throw new IllegalArgumentException(s"expected mapping, got: $other")
    }
    def asMap(o: Object): Map[String, Object] = asPairs(o).toMap
    def str(m: Map[String, Object], k: String): String =
      m.get(k).map(_.toString).getOrElse(
        throw new IllegalArgumentException(s"missing required key '$k' in $m"))
    def opt(m: Map[String, Object], k: String): Option[String] =
      m.get(k).map(_.toString)
    def strList(m: Map[String, Object], k: String): Seq[String] = m.get(k) match {
      case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
      case Some(other) => Seq(other.toString)
      case None => Nil
    }

    val dbm = asMap(root.getOrElse("Database",
      throw new IllegalArgumentException("config missing 'Database' section")))
    val database = DatabaseMeta(
      name = str(dbm, "name"),
      version = str(dbm, "version"),
      author = opt(dbm, "author"),
      website = opt(dbm, "website"),
      repository = opt(dbm, "repository"))

    val sources = asMap(root.getOrElse("Sources", new java.util.HashMap()))
      .map { case (name, conf) =>
        val m = asMap(conf)
        // reference spells it "source type" (config.yml:10); accept both.
        val tpe = opt(m, "source type").orElse(opt(m, "source_type"))
          .getOrElse("parquet")
        val path = opt(m, "path").orElse(opt(m, "database name"))
          .orElse(opt(m, "config file")).getOrElse("")
        val extra = m.view
          .filterKeys(k => !Set("source type", "source_type", "path",
            "database name", "config file").contains(k))
          .map { case (k, v) => k -> v.toString }.toMap
        name -> SourceConf(name, tpe, path, extra)
      }

    val nodes = asPairs(root.getOrElse("Nodes", new java.util.HashMap()))
      .map { case (label, conf) =>
        val pairs = asPairs(conf)
        val m = pairs.toMap
        // Two accepted shapes: nested under `sources:` (ours) or source
        // names directly at node level (reference config.yml:16-33). Source
        // order is config order — it decides A2 merge precedence.
        val srcPairs = pairs.collectFirst { case ("sources", v) => asPairs(v) }
          .getOrElse(pairs.filterNot(_._1 == "id_key_label"))
        val srcs = srcPairs.map { case (srcName, sconf) =>
          val sm = asMap(sconf)
          NodeSourceConf(
            source = srcName,
            table = str(sm, "table"),
            idKey = str(sm, "id_key"),
            uriKey = opt(sm, "uri_key"))
        }
        NodeConf(label, opt(m, "id_key_label"), srcs)
      }

    val rels = asPairs(root.getOrElse("Relationships", new java.util.HashMap()))
      .map { case (label, conf) =>
        val pairs = asPairs(conf)
        val m = pairs.toMap
        val srcPairs = pairs.collectFirst { case ("sources", v) => asPairs(v) }
          .getOrElse(
            pairs.filterNot(p => Set("start_node", "end_node").contains(p._1)))
        val srcs = srcPairs.map { case (srcName, sconf) =>
          val sm = asMap(sconf)
          val mode = str(sm, "type") match {
            case "foreign_key" =>
              val s = asMap(sm("start")); val e = asMap(sm("end"))
              ForeignKeyMode(
                str(s, "node"), str(s, "table"), str(s, "key"),
                str(e, "node"), str(e, "table"), str(e, "key"),
                startProps = strList(s, "props"), endProps = strList(e, "props"))
            case "join_table" =>
              JoinTableMode(str(sm, "table"), str(sm, "from_field"),
                str(sm, "to_field"), props = strList(sm, "props"))
            case other =>
              throw new IllegalArgumentException(
                s"unknown relationship type '$other' for $label")
          }
          RelSourceConf(srcName, mode)
        }
        val (sn, en) = srcs.map(_.mode).collectFirst {
          case fk: ForeignKeyMode => (Some(fk.startNode), Some(fk.endNode))
        }.getOrElse((opt(m, "start_node"), opt(m, "end_node")))
        RelConf(label, sn, en, srcs)
      }

    GraphConfig(database, sources, nodes, rels)
  }
}
