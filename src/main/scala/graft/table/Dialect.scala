package graft.table

import org.apache.spark.sql.types._

/** The reference's dual-RDB dialect seam, re-expressed as data.
  *
  * The reference keeps two nearly-identical pipelines
  * (`backend/process/postgres.py`, `backend/process/maria.py`) whose
  * only semantic differences are DDL-level dialect rewrites
  * (`maria.py:105-118`): `SERIAL` → `INT AUTO_INCREMENT`,
  * `TIMESTAMP WITH TIME ZONE` → `TIMESTAMP` (MySQL-family engines have
  * no TZ-carrying timestamp type), backtick identifier quoting, and an
  * `ENGINE=InnoDB DEFAULT CHARSET=utf8mb4` table suffix. The shared
  * document schema (`backend/utils/schema.py`) maps every key/metadata
  * column to `VARCHAR(300)` and the content/embedding columns to
  * `TEXT`.
  *
  * Here the rewrite is ONE function per dialect instead of a forked
  * pipeline: the same column-config list renders to either engine's
  * DDL, and [[sparkColumnTypes]] renders the same mapping as a Spark
  * JDBC `createTableColumnTypes` option so the distributed writer
  * creates the reference's physical schema instead of the dialect's
  * LOB default (Derby: CLOB; MySQL: TEXT) for string columns.
  *
  * No MySQL-family embedded engine ships in this environment (zero
  * egress; only Derby's jars ride with Spark), so the MariaDB leg is
  * spec-pinned at the DDL/type-mapping level (DialectSpec asserts the
  * rewrite laws and the rendered DDL shape against the reference's own
  * schema) while the Derby leg runs LIVE through the same
  * [[sparkColumnTypes]] path — the type mapping is verified against a
  * real engine's catalog, the MySQL-isms against the reference's
  * recorded output.
  */
object Dialect {

  /** One column of the reference's `columns_config` list:
    * `{"name": ..., "type": ...}` with the type in POSTGRES dialect
    * (the canonical form; other dialects rewrite from it). */
  final case class ColumnConfig(name: String, colType: String)

  sealed trait SqlDialect {
    def name: String
    /** Identifier quoting (maria quotes with backticks, postgres
      * passes through — `postgres.py:118` vs `maria.py:111`). */
    def quote(ident: String): String
    /** Dialect rewrite of a canonical (Postgres-dialect) column type. */
    def rewriteType(t: String): String
    /** Table-options suffix after the column list. */
    def tableSuffix: String

    /** The reference's CREATE TABLE statement for this dialect —
      * same shape both engines: IF NOT EXISTS + per-column lines. */
    def createTable(table: String, cols: Seq[ColumnConfig]): String = {
      val colSql = cols
        .map(c => s"${quote(c.name)} ${rewriteType(c.colType)}")
        .mkString(",\n  ")
      s"CREATE TABLE IF NOT EXISTS ${quote(table)} (\n  $colSql\n)$tableSuffix;"
    }

    /** The chunked-insert statement (`postgres.py:163`/`maria.py:146`):
      * positional placeholders, explicit column list. */
    def insertSql(table: String, columns: Seq[String]): String =
      s"INSERT INTO ${quote(table)} (${columns.map(quote).mkString(", ")})" +
        s" VALUES (${columns.map(_ => "?").mkString(", ")})"
  }

  /** Canonical dialect: types pass through, identifiers unquoted
    * (`postgres.py:117-126`). */
  case object Postgres extends SqlDialect {
    val name = "postgres"
    def quote(ident: String): String = ident
    def rewriteType(t: String): String = t
    val tableSuffix = ""
  }

  /** The MariaDB rewrite (`maria.py:105-118`): SERIAL →
    * INT AUTO_INCREMENT, timezone stripped from TIMESTAMP, backtick
    * quoting, InnoDB/utf8mb4 table options. Rewrites are ordered the
    * way the reference orders them — SERIAL first — so a type like
    * `BIGSERIAL` degrades identically (`BIGINT AUTO_INCREMENT` is not
    * produced by the reference either; its schema only uses plain
    * SERIAL). */
  case object MariaDb extends SqlDialect {
    val name = "mariadb"
    def quote(ident: String): String = s"`$ident`"
    def rewriteType(t: String): String = t
      .replace("SERIAL", "INT AUTO_INCREMENT")
      .replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
    val tableSuffix = " ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
  }

  /** Derby, the live-testable engine in this build: ANSI double-quote
    * identifiers, no SERIAL (GENERATED ALWAYS AS IDENTITY), no
    * timezone-carrying timestamp. Used by the live spec leg so the
    * SAME rendering/mapping code path is exercised against a real
    * catalog. */
  case object Derby extends SqlDialect {
    val name = "derby"
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def rewriteType(t: String): String = t
      .replace("SERIAL", "INT GENERATED ALWAYS AS IDENTITY")
      .replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
      // Derby has no TEXT type; the reference's TEXT columns are
      // unbounded document content → Derby's LONG VARCHAR
      .replace("TEXT", "LONG VARCHAR")
    val tableSuffix = ""
  }

  /** The reference's document-store schema (`backend/utils/schema.py`
    * `pg_schema`, canonical dialect). `maria_schema` in the reference
    * is this plus the dialect rewrite and an explicit PRIMARY KEY on
    * id — rendered here via [[MariaDb.rewriteType]], pinned by spec. */
  val DocSchema: Seq[ColumnConfig] = Seq(
    ColumnConfig("id", "VARCHAR(300) NOT NULL"),
    ColumnConfig("page_content", "TEXT NOT NULL"),
    ColumnConfig("filename", "VARCHAR(300) NOT NULL"),
    ColumnConfig("filepath", "VARCHAR(300) NOT NULL"),
    ColumnConfig("hashed_filename", "VARCHAR(300)"),
    ColumnConfig("hashed_filepath", "VARCHAR(300)"),
    ColumnConfig("hashed_page_content", "VARCHAR(300)"),
    ColumnConfig("page", "VARCHAR(300) NOT NULL"),
    ColumnConfig("lv1_cat", "VARCHAR(300)"),
    ColumnConfig("lv2_cat", "VARCHAR(300)"),
    ColumnConfig("lv3_cat", "VARCHAR(300)"),
    ColumnConfig("lv4_cat", "VARCHAR(300)"),
    ColumnConfig("embeddings", "TEXT"),
    ColumnConfig("created_at",
      "TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP"),
    ColumnConfig("updated_at",
      "TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP"))

  /** Render a Spark schema as the JDBC writer's
    * `createTableColumnTypes` option under the reference's width
    * discipline: every string column NOT named in `textCols` maps to
    * VARCHAR(300) (the reference's uniform key/metadata width).
    * `textCols` and non-string columns are OMITTED
    * (`createTableColumnTypes` is a partial override, and Spark parses
    * it with its OWN DDL parser — dialect-native LOB names like
    * Derby's `LONG VARCHAR` or MySQL's `TEXT` don't parse), so they
    * fall back to the JDBC dialect's default string mapping — which IS
    * the TEXT-equivalent LOB (Derby CLOB, MySQL TEXT): exactly the
    * reference's TEXT columns.
    *
    * This is what makes the distributed write land the REFERENCE's
    * physical schema: without the override Spark maps EVERY StringType
    * to the LOB default, which on most engines cannot be indexed or
    * equality-compared — the reference's keyed lookups
    * (`SELECT ... WHERE hashed_filepath = ?`) depend on VARCHAR keys. */
  def sparkColumnTypes(schema: StructType,
      textCols: Set[String] = Set.empty): String =
    schema.fields.toSeq.collect {
      case StructField(n, StringType, _, _) if !textCols.contains(n) =>
        // backquote the identifier (escaping embedded backticks the
        // Spark way — doubling) so reserved words / spaces / symbols
        // in column names survive Spark's column-types DDL parser
        s"`${n.replace("`", "``")}` VARCHAR(300)"
    }.mkString(", ")
}
