package graft.lake

/** Lake addressing + entry contract (SURVEY.md §2.7 E1–E5).
  *
  * Mirrors the reference's shell/env surface:
  *  - inbound object keys are `inbound/{source_system}/{table}/{file}`
  *    (/root/reference/FInal/script.sh:13-16);
  *  - per-table config lives at `{cfg}/{src}/{tbl}/{tbl}_config.json`
  *    (v2 layout, FInal/script.sh:34-41 — adopted over v1's divergent
  *    `config/{src}/{tbl}_config.json`, SURVEY.md §2.9.8);
  *  - zone roots come from the LANDING/CONFIG/CURATED env contract
  *    (FInal/script.sh:67-71);
  *  - `s3://` is rewritten to `s3a://` for Spark-facing paths only
  *    (FInal/load_script.py:138-147). Local FS paths pass through.
  */
final case class InboundKey(
    inboundFolder: String, sourceSystem: String, table: String,
    fileName: String) {
  def filePath: String =
    s"$inboundFolder/$sourceSystem/$table/$fileName"
}

object InboundKey {
  /** E1 — parse `inbound/{src}/{tbl}/{file...}`; the file part may
    * itself contain `/`. */
  def parse(key: String): InboundKey = key.split("/", 4) match {
    case Array(inb, src, tbl, file) if file.nonEmpty =>
      InboundKey(inb, src, tbl, file)
    case _ => throw new IllegalArgumentException(
      s"Inbound key must be {inbound}/{source_system}/{table}/{file}: $key")
  }
}

final case class LakeLayout(
    landingRoot: String, configRoot: String, curatedRoot: String) {

  private def join(root: String, parts: String*): String =
    (root.stripSuffix("/") +: parts).mkString("/")

  /** E2 — one logical table = `{zone}/{source_system}/{table}/`
    * (FInal/load_script.py:179-180). */
  def landingPath(sourceSystem: String, table: String): String =
    LakeLayout.sparkScheme(join(landingRoot, sourceSystem, table))
  def curatedPath(sourceSystem: String, table: String): String =
    LakeLayout.sparkScheme(join(curatedRoot, sourceSystem, table))
  /** v2 config layout: `{cfg}/{src}/{tbl}/{tbl}_config.json`. */
  def configPath(sourceSystem: String, table: String): String =
    join(configRoot, sourceSystem, table, s"${table}_config.json")
}

object LakeLayout {
  /** E5 — Spark-facing scheme rewrite; non-S3 paths pass through. */
  def sparkScheme(path: String): String =
    if (path.startsWith("s3://")) "s3a://" + path.stripPrefix("s3://")
    else path

  /** E4 — env-var contract (names match the reference; values here are
    * local directories). */
  def fromEnv(env: Map[String, String] = sys.env): LakeLayout = LakeLayout(
    landingRoot = env.getOrElse("LANDING_BUCKET", "/tmp/graft-lake/landing"),
    configRoot = env.getOrElse("CONFIG_BUCKET", "/tmp/graft-lake/config"),
    curatedRoot = env.getOrElse("CURATED_BUCKET", "/tmp/graft-lake/curated"))
}
