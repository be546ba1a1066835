package graft

import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

/** Deterministic blockchair-shaped TSV fixtures (FIXTURES.md; schemas
  * mirror /root/reference/sql/ddl/). Tiny but exercises: >2^31 satoshi
  * totals, coinbase rows, N-input × M-output fan-out, null keys (dropped
  * by staging), gzip transparency.
  */
object Fixtures {

  val blocksHeader: String =
    ("id\thash\ttime\tmedian_time\tsize\tstripped_size\tweight\tversion\t" +
      "version_hex\tversion_bits\tmerkle_root\tnonce\tbits\tdifficulty\t" +
      "chainwork\tcoinbase_data_hex\ttransaction_count\twitness_count\t" +
      "input_count\toutput_count\tinput_total\tinput_total_usd\t" +
      "output_total\toutput_total_usd\tfee_total\tfee_total_usd\t" +
      "fee_per_kb\tfee_per_kb_usd\tfee_per_kwu\tfee_per_kwu_usd\t" +
      "cdd_total\tgeneration\tgeneration_usd\treward\treward_usd\t" +
      "guessed_miner")

  val blocksRows: Seq[String] = Seq(
    // input_total 5041234567890 > 2^31 on purpose
    "100\tb100hash\t2025-08-20 00:03:11\t2025-08-19 23:41:02\t1734202\t781455\t3993993\t536870912\t20000000\t000000100000000000000000000000\tmr100\t2083236893\t386021892\t129697438529603\tcw100\tcb100\t2\t1\t3\t3\t5041234567890\t582034122.55\t5044355567890\t582394788.01\t12100000\t13970.12\t6977.4\t8.06\t3029.9\t3.5\t1234.5\t312500000\t360937.5\t324600000\t374906.25\tMinerA",
    "101\tb101hash\t2025-08-20 00:12:45\t2025-08-20 00:01:33\t1500000\t700000\t3800000\t536870912\t20000000\t000000100000000000000000000000\tmr101\t998877665\t386021892\t129697438529603\tcw101\tcb101\t1\t1\t1\t1\t2000000000\t231000.0\t1999000000\t230884.5\t1000000\t115.5\t666.7\t0.08\t289.9\t0.03\t42.0\t312500000\t360937.5\t313500000\t362053.12\tMinerB",
    // null id row — must be dropped by stg_blocks' P2 filter
    "\tbadhash\t2025-08-20 00:20:00\t2025-08-20 00:10:00\t1\t1\t4\t1\t0\t0\tmr\t0\t0\t0\tcw\tcb\t0\t0\t0\t0\t0\t0.0\t0\t0.0\t0\t0.0\t0.0\t0.0\t0.0\t0.0\t0.0\t0\t0.0\t0\t0.0\tX")

  val txHeader: String =
    ("block_id\thash\ttime\tsize\tweight\tversion\tlock_time\tis_coinbase\t" +
      "has_witness\tinput_count\toutput_count\tinput_total\tinput_total_usd\t" +
      "output_total\toutput_total_usd\tfee\tfee_usd\tfee_per_kb\t" +
      "fee_per_kb_usd\tfee_per_kwu\tfee_per_kwu_usd\tcdd_total")

  val txRows: Seq[String] = Seq(
    "100\tt1\t2025-08-20 00:03:11\t300\t1200\t2\t0\t1\t1\t1\t1\t0\t0.0\t324600000\t374906.25\t0\t0.0\t0.0\t0.0\t0.0\t0.0\t0.0",
    "100\tt2\t2025-08-20 00:03:11\t500\t2000\t2\t0\t0\t1\t2\t2\t5041234567890\t582034122.55\t5041222467890\t582032722.55\t12100000\t1400.0\t24200.0\t2.8\t6050.0\t0.7\t3029.9",
    "101\tt3\t2025-08-20 00:12:45\t400\t1600\t2\t0\t0\t1\t1\t1\t2000000000\t231000.0\t1999000000\t230884.5\t1000000\t115.5\t2500.0\t0.29\t625.0\t0.07\t289.9",
    "101\t\t2025-08-20 00:12:45\t1\t4\t2\t0\t0\t0\t0\t0\t0\t0.0\t0\t0.0\t0\t0.0\t0.0\t0.0\t0.0\t0.0\t0.0")

  val inputsHeader: String =
    ("block_id\ttransaction_hash\tindex\ttime\tvalue\tvalue_usd\trecipient\t" +
      "type\tscript_hex\tis_from_coinbase\tis_spendable\tspending_block_id\t" +
      "spending_transaction_hash\tspending_index\tspending_time\t" +
      "spending_value_usd\tspending_sequence\tspending_signature_hex\t" +
      "spending_witness\tlifespan\tcdd")

  val inputsRows: Seq[String] = Seq(
    // t2 spends from addresses A and B; lifespan chosen so
    // cdd = lifespan/86400 * value/1e8 is exact-ish
    "100\tt2\t0\t2025-08-20 00:03:11\t3000000000000\t346410000.0\taddrA\tP2PKH\tsh1\t0\t1\t90\tprev1\t0\t2025-08-10 00:03:11\t300000.0\t4294967295\tsig1\twit1\t864000\t300000.0",
    "100\tt2\t1\t2025-08-20 00:03:11\t2041234567890\t235624122.55\taddrB\tP2PKH\tsh2\t0\t1\t91\tprev2\t1\t2025-08-12 00:03:11\t200000.0\t4294967295\tsig2\twit2\t432000\t102061.72",
    "100\tt1\t0\t2025-08-20 00:03:11\t0\t0.0\t\tcoinbase\tcbsh\t1\t0\t\t\t\t\t\t\t\t\t0\t0.0",
    "101\tt3\t0\t2025-08-20 00:12:45\t2000000000\t231000.0\taddrC\tP2WPKH\tsh3\t0\t1\t95\tprev3\t0\t2025-08-15 00:12:45\t220000.0\t4294967295\tsig3\twit3\t172800\t40.0")

  val outputsHeader: String =
    ("block_id\ttransaction_hash\tindex\ttime\tvalue\tvalue_usd\trecipient\t" +
      "type\tscript_hex\tis_from_coinbase\tis_spendable")

  val outputsRows: Seq[String] = Seq(
    "100\tt1\t0\t2025-08-20 00:03:11\t324600000\t374906.25\taddrA\tP2PKH\tosh1\t1\t1",
    "100\tt2\t0\t2025-08-20 00:03:11\t3000000000000\t346410000.0\taddrC\tP2PKH\tosh2\t0\t1",
    "100\tt2\t1\t2025-08-20 00:03:11\t2041222467890\t235622722.55\taddrD\tP2PKH\tosh3\t0\t1",
    "101\tt3\t0\t2025-08-20 00:12:45\t1999000000\t230884.5\taddrD\tP2WPKH\tosh4\t0\t1")

  val addressesHeader: String = "address\tbalance"
  val addressesRows: Seq[String] = Seq(
    "addrA\t324600000",
    "addrB\t0",
    "addrC\t3000000000000",
    "addrD\t2043221467890",
    "\t12345") // null address row — dropped by stg_addresses

  /** Write the five fixture TSVs (blocks gzipped to prove transparency)
    * into `dir` with reference-conformant names for date 20250820. */
  def writeAll(dir: Path): Map[String, Path] = {
    Files.createDirectories(dir)
    def writePlain(name: String, header: String, rows: Seq[String]): Path = {
      val p = dir.resolve(name)
      Files.writeString(p, (header +: rows).mkString("\n") + "\n")
      p
    }
    def writeGz(name: String, header: String, rows: Seq[String]): Path = {
      val p = dir.resolve(name)
      val out = new GZIPOutputStream(Files.newOutputStream(p))
      out.write(((header +: rows).mkString("\n") + "\n").getBytes("UTF-8"))
      out.close()
      p
    }
    Map(
      "blocks" -> writeGz("blockchair_bitcoin_blocks_20250820.tsv.gz",
        blocksHeader, blocksRows),
      "transactions" -> writePlain(
        "blockchair_bitcoin_transactions_20250820.tsv", txHeader, txRows),
      "inputs" -> writePlain("blockchair_bitcoin_inputs_20250820.tsv",
        inputsHeader, inputsRows),
      "outputs" -> writePlain("blockchair_bitcoin_outputs_20250820.tsv",
        outputsHeader, outputsRows),
      "addresses" -> writePlain("blockchair_bitcoin_addresses_20250820.tsv",
        addressesHeader, addressesRows))
  }
}
