package graft.cdc

import java.io.StringReader
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Config-driven routing catalog: table→PK list and source→target rename,
  * with `db.table` overriding `table`, and defaults (PK `id`, target =
  * lowercased source name).
  *
  * Reference semantics: PK/map parsing
  * /root/reference/consumer/src/main/java/com/example/cdc/DebeziumToPostgresConsumer.java:77-91,
  * precedence + defaulting :156-172, config file
  * /root/reference/consumer/src/main/resources/config.properties:15-20.
  *
  * The catalog is a tiny immutable value closed over by executors —
  * semantically a broadcast dimension; no lookup shuffle at any scale.
  */
final case class CdcCatalog(
    pk: Map[String, Seq[String]],
    rename: Map[String, String],
    topicsRegex: Option[String] = None) extends Serializable {

  /** Kafka subscription pattern: `topics.regex` from the config
    * (consumer config.properties:6), defaulting to the reference's
    * two-table pattern shape. */
  def subscribePattern: String =
    topicsRegex.getOrElse("^[^.]+\\.[^.]+\\..+$")

  /** `pk.<db>.<table>` > `pk.<table>` > ["id"]. */
  def pkFor(db: String, table: String): Seq[String] = {
    val t = Option(table).getOrElse("").toLowerCase
    val d = Option(db).getOrElse("").toLowerCase
    pk.getOrElse(s"$d.$t", pk.getOrElse(t, CdcCatalog.DefaultPk))
  }

  /** `map.<db>.<table>` > `map.<table>` > lowercase(table). */
  def targetFor(db: String, table: String): String = {
    val t = Option(table).getOrElse("").toLowerCase
    val d = Option(db).getOrElse("").toLowerCase
    rename.getOrElse(s"$d.$t", rename.getOrElse(t, t))
  }
}

object CdcCatalog {
  val DefaultPk: Seq[String] = Seq("id")

  val empty: CdcCatalog = CdcCatalog(Map.empty, Map.empty)

  /** Parse `pk.*` (comma-split, multi-column supported) and `map.*`
    * entries from java-properties content; keys lowercased. */
  def fromProperties(props: Properties): CdcCatalog = {
    val entries = props.asScala.toMap
    val pk = entries.collect { case (k, v) if k.startsWith("pk.") =>
      k.stripPrefix("pk.").toLowerCase ->
        v.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
    }
    val rename = entries.collect { case (k, v) if k.startsWith("map.") =>
      k.stripPrefix("map.").toLowerCase -> v.trim.toLowerCase
    }
    CdcCatalog(pk, rename, entries.get("topics.regex").map(_.trim))
  }

  def fromPropertiesString(content: String): CdcCatalog = {
    val p = new Properties()
    p.load(new StringReader(content))
    fromProperties(p)
  }

  /** 3-tier config resolution, mirroring the reference's loadConfig
    * (DebeziumToPostgresConsumer.java:36-75): explicit env-var path →
    * ./config.properties in the working directory → classpath resource.
    * Throws if none is found (same fail-fast contract). */
  def load(envVar: String = "CONSUMER_CONFIG",
      fileName: String = "config.properties"): CdcCatalog = {
    import java.nio.file.{Files, Paths}
    sys.env.get(envVar).map(Paths.get(_)).filter(Files.exists(_)) match {
      case Some(p) => fromPropertiesString(new String(Files.readAllBytes(p)))
      case None =>
        val cwd = Paths.get(fileName)
        if (Files.exists(cwd))
          fromPropertiesString(new String(Files.readAllBytes(cwd)))
        else Option(getClass.getClassLoader.getResourceAsStream(fileName)) match {
          case Some(in) =>
            try fromPropertiesString(new String(in.readAllBytes())) finally in.close()
          case None => throw new IllegalStateException(
            s"no CDC config: $$${envVar}, ./$fileName, or classpath $fileName")
        }
    }
  }
}
