package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Paths

/** S4/M7 — config validation + env substitution semantics
  * (reference DOWNLOAD_SCHEMA + DownloadConfig). */
class FetchConfigSpec extends AnyFunSuite {

  private val valid =
    """{
      |  "base_url": "https://example.org/dumps",
      |  "api_key": null,
      |  "data_types": ["blocks", "transactions"],
      |  "file_format": "tsv.gz",
      |  "destination_dir": "/data/bitcoin",
      |  "retention_days": 7
      |}""".stripMargin

  test("valid config parses with typed fields") {
    val c = FetchConfig.parse(valid, Map.empty).toOption.get
    assert(c.baseUrl == "https://example.org/dumps")
    assert(c.apiKey.isEmpty)
    assert(c.dataTypes == Seq("blocks", "transactions"))
    assert(c.destinationDir == Paths.get("/data/bitcoin"))
    assert(c.retentionDays == 7)
  }

  test("retention_days accepts a numeric string (schema's string|integer)") {
    val c = FetchConfig
      .parse(valid.replace("7", "\"14\""), Map.empty).toOption.get
    assert(c.retentionDays == 14)
  }

  test("env substitution: ${VAR} resolves, ${VAR:-default} falls back") {
    val json = valid.replace("\"/data/bitcoin\"", "\"${GRAFT_DEST}\"")
      .replace("\"https://example.org/dumps\"",
        "\"${GRAFT_URL:-https://fallback.org/d}\"")
    val c = FetchConfig
      .parse(json, Map("GRAFT_DEST" -> "/mnt/dumps")).toOption.get
    assert(c.destinationDir == Paths.get("/mnt/dumps"))
    assert(c.baseUrl == "https://fallback.org/d")
  }

  test("unset env var with no default on a required key is an error") {
    val json = valid.replace("\"/data/bitcoin\"", "\"${GRAFT_NOPE}\"")
    val err = FetchConfig.parse(json, Map.empty).swap.toOption.get
    assert(err.contains("GRAFT_NOPE"))
  }

  test("set-but-empty env var falls back to the default (shell :-)") {
    val json = valid.replace("\"/data/bitcoin\"",
      "\"${GRAFT_DEST:-/fallback}\"")
    val c = FetchConfig.parse(json, Map("GRAFT_DEST" -> "")).toOption.get
    assert(c.destinationDir == Paths.get("/fallback"))
    // empty + no default on a required key is still an error
    val bare = valid.replace("\"/data/bitcoin\"", "\"${GRAFT_DEST}\"")
    assert(FetchConfig.parse(bare, Map("GRAFT_DEST" -> "")).isLeft)
  }

  test("missing required keys are reported") {
    val err = FetchConfig
      .parse("""{"base_url": "https://x"}""", Map.empty).swap.toOption.get
    assert(err.contains("missing required key"))
    val err2 = FetchConfig.parse(
      """{"base_url": "https://x", "file_format": "tsv.gz",
        |"destination_dir": "/d", "retention_days": 3}""".stripMargin,
      Map.empty).swap.toOption.get
    assert(err2.contains("data_types"))
  }

  test("base_url scheme, file_format enum, data_types enum are enforced") {
    assert(FetchConfig.parse(valid.replace("https://example.org/dumps",
      "ftp://example.org"), Map.empty).swap.toOption.get.contains("base_url"))
    assert(FetchConfig.parse(valid.replace("tsv.gz", "csv"), Map.empty)
      .swap.toOption.get.contains("file_format"))
    assert(FetchConfig.parse(valid.replace("\"blocks\"", "\"wallets\""),
      Map.empty).swap.toOption.get.contains("wallets"))
  }

  test("retention_days below 1 and non-integer are rejected") {
    assert(FetchConfig.parse(valid.replace(": 7", ": 0"), Map.empty).isLeft)
    assert(FetchConfig
      .parse(valid.replace(": 7", ": \"soon\""), Map.empty).isLeft)
  }

  test("invalid JSON is a clean error, not an exception") {
    assert(FetchConfig.parse("{not json", Map.empty).isLeft)
  }

  test("api_key substitutes but stays optional") {
    val json = valid.replace("null", "\"${GRAFT_KEY:-}\"")
    val c = FetchConfig.parse(json, Map.empty).toOption.get
    assert(c.apiKey.isEmpty)
    val c2 = FetchConfig.parse(json, Map("GRAFT_KEY" -> "k123")).toOption.get
    assert(c2.apiKey.contains("k123"))
  }
}
