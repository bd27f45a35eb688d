package graft.pipeline

/** One upstream source's declaration — the reference externalizes these in
  * airflow/dags/config/sources.yaml (per-source description / readme /
  * headers / index / updates urls) and gcp-config.yaml (warehouse
  * coordinates), and its DAGs read the registry instead of hard-coding
  * urls. Same shape here, typed.
  *
  * `keys` are the merge keys [[graft.sources.StagingSink.mergeToMain]]
  * dedups on; `schedule` is the [[Pipeline.schedule]] cron; `extra` keeps
  * any source-specific fields (readme/headers/...) without schema churn.
  */
final case class SourceConfig(
    name: String,
    description: Option[String],
    index: Option[String],
    updates: Option[String],
    table: Option[String],
    schedule: Option[String],
    keys: Seq[String],
    extra: Map[String, String]
) {
  /** Fields every live pipeline needs before it can run; used by
    * preflight-style validation so a half-declared source fails at parse
    * time, not mid-DAG.
    */
  def require(fields: String*): Either[String, SourceConfig] = {
    val known: Map[String, Option[String]] = Map(
      "description" -> description, "index" -> index, "updates" -> updates,
      "table" -> table, "schedule" -> schedule,
      "keys" -> (if (keys.nonEmpty) Some(keys.mkString(",")) else None))
    val missing = fields.filter(f => known.getOrElse(f, extra.get(f)).isEmpty)
    if (missing.isEmpty) Right(this) else Left(s"source '$name' missing: ${missing.mkString(", ")}")
  }
}

/** Parses a flat `source.field = value` properties text into typed
  * [[SourceConfig]]s — java.util.Properties syntax, so no new dependency,
  * comments with `#`, and the file diff-reviews like the reference's yaml.
  *
  * {{{
  * uscrn.description = Hourly historical weather data from USCRN
  * uscrn.index       = https://example.org/products/hourly02/
  * uscrn.updates     = https://example.org/products/hourly02/updates/
  * uscrn.table       = uscrn_main
  * uscrn.schedule    = 0 10 * * *
  * uscrn.keys        = wbanno, utc_datetime
  * }}}
  */
object SourceRegistry {

  def parse(text: String): Map[String, SourceConfig] = {
    val props = new java.util.Properties()
    props.load(new java.io.StringReader(text))
    import scala.jdk.CollectionConverters._
    val flat = props.asScala.toMap
    // A key without a `source.field` shape is a typo'd declaration; fail
    // the parse rather than silently running the pipeline without it.
    val malformed = flat.keys.filter(!_.matches("[^.]+\\..+")).toSeq.sorted
    if (malformed.nonEmpty)
      throw new IllegalArgumentException(
        s"malformed source config keys (expected source.field): ${malformed.mkString(", ")}")
    flat.keys
      .flatMap(k => k.split("\\.", 2) match {
        case Array(src, _) => Some(src)
        case _             => None
      })
      .toSeq.distinct
      .map { src =>
        val fields = flat.collect {
          case (k, v) if k.startsWith(src + ".") => k.drop(src.length + 1) -> v.trim
        }
        val reserved = Set("description", "index", "updates", "table", "schedule", "keys")
        src -> SourceConfig(
          name = src,
          description = fields.get("description"),
          index = fields.get("index"),
          updates = fields.get("updates"),
          table = fields.get("table"),
          schedule = fields.get("schedule"),
          keys = fields.get("keys").toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)),
          extra = fields.filterNot { case (k, _) => reserved(k) }
        )
      }
      .toMap
  }

  def load(path: String): Map[String, SourceConfig] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
