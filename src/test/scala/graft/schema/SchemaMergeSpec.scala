package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import SchemaMerge._

class SchemaMergeSpec extends AnyFunSuite {

  private def c(n: String, t: SfType) = ColumnSpec(n, t)

  test("no old schema → replace") {
    assert(widen(Nil, Seq(c("A", SfInteger))) == Replace(Seq(c("A", SfInteger))))
  }

  test("no common columns → replace") {
    assert(widen(Seq(c("A", SfInteger)), Seq(c("B", SfFloat)))
      == Replace(Seq(c("B", SfFloat))))
  }

  test("all equal → identical (SchemaSkipError analog)") {
    val s = Seq(c("A", SfInteger), c("B", SfVarchar(64)))
    assert(widen(s, s) == Identical)
  }

  test("VARCHAR widening accepted, narrowing rejected") {
    val old = Seq(c("A", SfVarchar(64)))
    assert(widen(old, Seq(c("A", SfVarchar(128))))
      == Replace(Seq(c("A", SfVarchar(128)))))
    assert(widen(old, Seq(c("A", SfVarchar(32)))).isInstanceOf[Rejected])
  }

  test("INTEGER→FLOAT widens; FLOAT→INTEGER rejected") {
    assert(widen(Seq(c("A", SfInteger)), Seq(c("A", SfFloat)))
      == Replace(Seq(c("A", SfFloat))))
    assert(widen(Seq(c("A", SfFloat)), Seq(c("A", SfInteger)))
      .isInstanceOf[Rejected])
  }

  test("DATE→TIMESTAMP widens; TIMESTAMP→DATE rejected") {
    assert(widen(Seq(c("A", SfDate)), Seq(c("A", SfTimestamp)))
      == Replace(Seq(c("A", SfTimestamp))))
    assert(widen(Seq(c("A", SfTimestamp)), Seq(c("A", SfDate)))
      .isInstanceOf[Rejected])
  }

  test("any other mismatch rejected") {
    assert(widen(Seq(c("A", SfInteger)), Seq(c("A", SfVarchar(16))))
      .isInstanceOf[Rejected])
    assert(widen(Seq(c("A", SfBoolean)), Seq(c("A", SfInteger)))
      .isInstanceOf[Rejected])
  }

  test("one widened + others equal → replace") {
    val old = Seq(c("A", SfInteger), c("B", SfVarchar(64)))
    val next = Seq(c("A", SfInteger), c("B", SfVarchar(256)))
    assert(widen(old, next) == Replace(next))
  }

  test("varchar tier ladder (config/ddl_config.json:5)") {
    assert(varcharTier(None) == 64)
    assert(varcharTier(Some(1)) == 16)
    assert(varcharTier(Some(16)) == 16)
    assert(varcharTier(Some(17)) == 32)
    assert(varcharTier(Some(100000)) == 131072)
    assert(varcharTier(Some(10000000)) == 262144) // capped at top tier
  }

  test("identifier sanitizer (F5)") {
    assert(sanitize("block id", 0) == "BLOCK_ID")
    assert(sanitize("fee(usd)", 3) == "FEE_USD")
    assert(sanitize("9lives", 2) == "COL_9LIVES")
    assert(sanitize("--", 7) == "COL_7")
    assert(sanitize("__x__", 1) == "X")
  }

  test("DDL render matches reference layout") {
    val ddl = renderDdl("BLOCKS_RAW",
      Seq(c("ID", SfInteger), c("HASH", SfVarchar(64))))
    assert(ddl ==
      "CREATE OR REPLACE TABLE BLOCKS_RAW (\n    ID INTEGER,\n    HASH VARCHAR(64)\n);")
    assertThrows[IllegalArgumentException](renderDdl("9bad", Seq(c("A", SfInteger))))
    assertThrows[IllegalArgumentException](renderDdl("T", Nil))
  }
}

/** Exhaustive properties over the (small) type lattice: reflexive-skip,
  * antisymmetry (mutual replace impossible on common columns), and tier
  * monotonicity. Exhaustive enumeration beats sampling here — the lattice
  * has only 5 scalar types + 15 varchar tiers. */
class SchemaMergeProps extends AnyFunSuite {
  import SchemaMerge._

  private val allTypes: Seq[SfType] =
    Seq(SfInteger, SfFloat, SfBoolean, SfDate, SfTimestamp) ++
      varcharTiers.map(SfVarchar)

  test("reflexivity: widen(s, s) is Identical for every type") {
    for (t <- allTypes) {
      val s = Seq(ColumnSpec("C", t))
      assert(widen(s, s) == Identical, s"for $t")
    }
  }

  test("antisymmetry: both directions cannot Replace (all type pairs)") {
    for (a <- allTypes; b <- allTypes) {
      val sa = Seq(ColumnSpec("C", a))
      val sb = Seq(ColumnSpec("C", b))
      val ab = widen(sa, sb)
      val ba = widen(sb, sa)
      assert(!(ab.isInstanceOf[Replace] && ba.isInstanceOf[Replace]),
        s"mutual replace for $a / $b")
    }
  }

  test("exactly one of Replace/Rejected/Identical per comparable pair") {
    for (a <- allTypes; b <- allTypes) {
      val r = widen(Seq(ColumnSpec("C", a)), Seq(ColumnSpec("C", b)))
      val kinds = Seq(r.isInstanceOf[Replace], r.isInstanceOf[Rejected],
        r == Identical)
      assert(kinds.count(identity) == 1)
    }
  }

  test("tier monotonicity: longer varchar always replaces") {
    for (a <- varcharTiers; b <- varcharTiers) {
      val r = widen(Seq(ColumnSpec("C", SfVarchar(a))),
        Seq(ColumnSpec("C", SfVarchar(b))))
      if (b > a) assert(r.isInstanceOf[Replace])
      else if (b < a) assert(r.isInstanceOf[Rejected])
      else assert(r == Identical)
    }
  }

  test("DDL text round-trips: renderDdl → parseDdl → widen is Identical") {
    val schema = Seq(
      ColumnSpec("ID", SfInteger), ColumnSpec("HASH", SfVarchar(64)),
      ColumnSpec("TIME", SfTimestamp), ColumnSpec("FEE", SfFloat),
      ColumnSpec("IS_COINBASE", SfBoolean), ColumnSpec("DAY", SfDate))
    val parsed = parseDdl(renderDdl("blocks", schema))
    assert(parsed == schema)
    assert(widen(parsed, schema) == Identical)
  }

  test("parseDdl seeds the widening gate from a pre-existing .sql file") {
    val preExisting =
      """-- generated earlier; comments and spacing are hostile
        |CREATE OR REPLACE TABLE txs (
        |    ID INTEGER,          -- surrogate key
        |    HASH VARCHAR ( 64 ), /* block
        |                            hash */
        |    SEEN DATE
        |);""".stripMargin
    val old = parseDdl(preExisting)
    assert(old == Seq(ColumnSpec("ID", SfInteger),
      ColumnSpec("HASH", SfVarchar(64)), ColumnSpec("SEEN", SfDate)))
    // a wider incoming schema replaces; a narrower one is rejected
    val wider = Seq(ColumnSpec("ID", SfInteger),
      ColumnSpec("HASH", SfVarchar(128)), ColumnSpec("SEEN", SfTimestamp))
    assert(widen(old, wider).isInstanceOf[Replace])
    val narrower = Seq(ColumnSpec("HASH", SfVarchar(32)))
    assert(widen(old, narrower).isInstanceOf[Rejected])
  }

  test("parseDdl ignores the CREATE ... TABLE header and trailing ;") {
    val parsed = parseDdl("CREATE OR REPLACE TABLE t (A INTEGER, B FLOAT);")
    assert(parsed == Seq(ColumnSpec("A", SfInteger), ColumnSpec("B", SfFloat)))
  }

  test("parseDdl handles inline constraints; skips vendor types") {
    // the constraint-carrying column must still seed the gate; a type
    // outside the lattice is skipped (it cannot participate in widen)
    val parsed = parseDdl(
      """CREATE TABLE t (
        |  ID INTEGER PRIMARY KEY,
        |  N NUMBER ( 38 ),
        |  H VARCHAR(64) NOT NULL
        |);""".stripMargin)
    assert(parsed == Seq(ColumnSpec("ID", SfInteger),
      ColumnSpec("H", SfVarchar(64))))
    // a table NAMED like a type must not parse as a column
    assert(parseDdl("CREATE TABLE DATE (A INTEGER);") ==
      Seq(ColumnSpec("A", SfInteger)))
    // vendor types that merely PREFIX a lattice type are skipped, not
    // misparsed (DATETIME ≠ DATE, TIMESTAMP_LTZ ≠ TIMESTAMP)
    assert(parseDdl(
      "CREATE TABLE t (S DATETIME, U TIMESTAMP_LTZ, A INTEGER);") ==
      Seq(ColumnSpec("A", SfInteger)))
  }

  test("render → parse identity over random schemas (200 trials)") {
    val rnd = new scala.util.Random(20260812L)
    val types: Seq[() => SfType] = Seq(
      () => SfInteger, () => SfFloat, () => SfBoolean, () => SfDate,
      () => SfTimestamp,
      () => SfVarchar(varcharTiers(rnd.nextInt(varcharTiers.size))))
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(12)
      val schema = (1 to n).map { i =>
        ColumnSpec(s"C${i}_${rnd.alphanumeric.take(4).mkString.toUpperCase}",
          types(rnd.nextInt(types.size))())
      }
      val ddl = renderDdl("t", schema)
      assert(parseDdl(ddl) == schema, ddl)
      assert(widen(parseDdl(ddl), schema) == Identical)
    }
  }

  test("parseExisting: JSON dump wins over DDL text; absent both → empty") {
    val json = renderJson(Seq(ColumnSpec("A", SfInteger)))
    val ddl = renderDdl("t", Seq(ColumnSpec("B", SfFloat)))
    assert(parseExisting(Some(json), Some(ddl)) ==
      Seq(ColumnSpec("A", SfInteger)))
    assert(parseExisting(None, Some(ddl)) == Seq(ColumnSpec("B", SfFloat)))
    assert(parseExisting(None, None).isEmpty)
  }
}
