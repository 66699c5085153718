package graft

/** Typed environment-driven configuration — the reference's `.env`
  * contract (reference: etl_pipeline.py:269-277 bucket/credentials,
  * 548-596 DB settings with missing-var validation and a connection
  * test), re-expressed for the Spark engine:
  *
  *   GRAFT_DROP_DIR     the file-drop directory (stands in for
  *                      BUCKET_NAME: where the date-named CSVs land)
  *   GRAFT_JDBC_URL     full JDBC URL (test/override escape hatch), OR
  *   GRAFT_DB_TYPE      postgresql (default) | mysql | mssql
  *   GRAFT_DB_HOST/PORT/NAME    assembled via [[graft.sinks.Sinks.jdbcUrl]]
  *   GRAFT_DB_USER / GRAFT_DB_PASSWORD
  *   GRAFT_TABLE        target table (default table_name, like the
  *                      reference's hard-coded 'table_name')
  *   GRAFT_LOG_TABLE    audit table (default data_processing_log)
  *
  * Validation reports EVERY missing variable by name (the reference's
  * ValueError names none — one fix-run instead of N). */
final case class EtlConfig(
    dropDir: String,
    jdbcUrl: String,
    user: String,
    password: String,
    table: String,
    logTable: String) {

  def jdbc: graft.sinks.Sinks.JdbcConfig =
    graft.sinks.Sinks.JdbcConfig(jdbcUrl, table, user, password)

  def jdbcLog: graft.sinks.Sinks.JdbcConfig =
    graft.sinks.Sinks.JdbcConfig(jdbcUrl, logTable, user, password)
}

object EtlConfig {

  /** Read + validate; Left is a human-actionable message listing every
    * missing variable. */
  def fromEnv(env: Map[String, String]): Either[String, EtlConfig] = {
    def get(k: String) = env.get(k).map(_.trim).filter(_.nonEmpty)
    val dropDir = get("GRAFT_DROP_DIR")
    val directUrl = get("GRAFT_JDBC_URL")
    val missing = scala.collection.mutable.ListBuffer[String]()
    if (dropDir.isEmpty) missing += "GRAFT_DROP_DIR"
    val url: Option[String] = directUrl match {
      case some @ Some(_) => some
      case None =>
        val host = get("GRAFT_DB_HOST")
        val name = get("GRAFT_DB_NAME")
        if (host.isEmpty) missing += "GRAFT_DB_HOST (or GRAFT_JDBC_URL)"
        if (name.isEmpty) missing += "GRAFT_DB_NAME (or GRAFT_JDBC_URL)"
        for (h <- host; n <- name) yield {
          val dbType = get("GRAFT_DB_TYPE").getOrElse("postgresql")
          val port = get("GRAFT_DB_PORT").map(_.toInt).getOrElse(
            dbType.toLowerCase match {
              case "mysql" => 3306
              case "mssql" | "sqlserver" => 1433
              case _ => 5432
            })
          graft.sinks.Sinks.jdbcUrl(dbType, h, port, n)
        }
    }
    val user = get("GRAFT_DB_USER")
    val password = get("GRAFT_DB_PASSWORD")
    if (user.isEmpty) missing += "GRAFT_DB_USER"
    if (password.isEmpty) missing += "GRAFT_DB_PASSWORD"
    if (missing.nonEmpty)
      Left("Missing required environment variables: " + missing.mkString(", ") +
        ". Check your environment (the reference's .env contract).")
    else
      Right(EtlConfig(dropDir.get, url.get, user.get, password.get,
        get("GRAFT_TABLE").getOrElse("table_name"),
        get("GRAFT_LOG_TABLE").getOrElse("data_processing_log")))
  }

  /** The reference's `engine.connect()` smoke test: open one JDBC
    * connection and close it. Left carries the driver's message. */
  def testConnection(cfg: EtlConfig): Either[String, Unit] =
    try {
      val c = java.sql.DriverManager.getConnection(
        cfg.jdbcUrl, cfg.user, cfg.password)
      c.close()
      Right(())
    } catch {
      case e: Exception => Left(s"Error connecting to database: ${e.getMessage}")
    }
}
