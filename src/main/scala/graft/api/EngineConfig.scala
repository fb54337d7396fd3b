package graft.api

import org.apache.spark.sql.SparkSession

/**
 * Layered engine configuration (reference: config.py:28-61 pydantic
 * ServerConfig with env > explicit > YAML > defaults, config.py:1-12).
 * The Spark-native layering is: `spark.graft.*` session conf (the
 * spark-submit --conf channel, standing in for env vars) > an explicit
 * config object passed by the caller > code defaults. Defaults mirror
 * the reference's documented values.
 */
final case class EngineConfig(
    /** reference security.max_file_size_mb = 5 (config.py:39) */
    maxFileSizeBytes: Long = 5L * 1024 * 1024,
    /** reference max_results_default = 100 (config.py:61) */
    maxResults: Int = 100,
    /** reference language.default_max_depth = 5 (config.py:50) */
    maxDepth: Int = 5,
    /** reference security.excluded_dirs analogue: url prefixes allowed in
     * (empty = everything) */
    allowedPrefixes: Seq[String] = Nil)

object EngineConfig {

  /** Conf-key prefix; e.g. `spark.graft.maxResults=50`. */
  val ConfPrefix = "spark.graft."

  /** Resolve the effective config: session conf overrides `explicit`
   * overrides defaults (reference precedence, config.py:1-12). */
  def resolve(spark: SparkSession, explicit: EngineConfig = EngineConfig()): EngineConfig = {
    def get(k: String): Option[String] = spark.conf.getOption(ConfPrefix + k)
    EngineConfig(
      maxFileSizeBytes = get("maxFileSizeBytes").map(_.toLong).getOrElse(explicit.maxFileSizeBytes),
      maxResults = get("maxResults").map(_.toInt).getOrElse(explicit.maxResults),
      maxDepth = get("maxDepth").map(_.toInt).getOrElse(explicit.maxDepth),
      allowedPrefixes = get("allowedPrefixes")
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(explicit.allowedPrefixes))
  }

  /** Effective-config report (reference: diagnose_config,
   * tools/registration.py:645-659): resolved values plus which layer won. */
  def describe(spark: SparkSession, explicit: EngineConfig = EngineConfig()): Map[String, (String, String)] = {
    val r = resolve(spark, explicit)
    val d = EngineConfig()
    def layer(k: String, eff: Any, exp: Any, dft: Any): (String, String) = {
      val from =
        if (spark.conf.getOption(ConfPrefix + k).isDefined) "session-conf"
        else if (exp != dft) "explicit" else "default"
      (eff.toString, from)
    }
    Map(
      "maxFileSizeBytes" -> layer("maxFileSizeBytes", r.maxFileSizeBytes, explicit.maxFileSizeBytes, d.maxFileSizeBytes),
      "maxResults" -> layer("maxResults", r.maxResults, explicit.maxResults, d.maxResults),
      "maxDepth" -> layer("maxDepth", r.maxDepth, explicit.maxDepth, d.maxDepth),
      "allowedPrefixes" -> layer("allowedPrefixes", r.allowedPrefixes.mkString(","), explicit.allowedPrefixes, d.allowedPrefixes))
  }
}
