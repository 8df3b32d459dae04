package graft

/** Known-benign log-noise suppression shared by the runnable mains
  * (tests carry the same list in src/test/resources/log4j2.properties). */
object LogNoise {
  /** Per-query/request FAIR pools are created on first use BY DESIGN —
    * FairSchedulableBuilder's "pool ... has not been configured" WARN
    * is pure noise at serving rates. */
  def silenceFairPoolWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.FairSchedulableBuilder",
      org.apache.logging.log4j.Level.ERROR)
}
