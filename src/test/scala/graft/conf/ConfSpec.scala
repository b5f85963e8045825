package graft.conf

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftError

class FieldMappingSpec extends AnyFunSuite {

  test("parses the three entry flavors in file order") {
    val m = FieldMapping.parseString(
      """a=src_a
        |b=$conf_b
        |c=#lit_c
        |d=src_d""".stripMargin)
    assert(m.entries == Seq(
      SourceField("a", "src_a"), ConfConstant("b", "conf_b"),
      LiteralConstant("c", "lit_c"), SourceField("d", "src_d")))
    assert(m.targets == Seq("a", "b", "c", "d"))
  }

  test("skips blanks and comment lines but not #-literals") {
    val m = FieldMapping.parseString(
      """# a comment
        |
        |v=#2.0""".stripMargin)
    assert(m.entries == Seq(LiteralConstant("v", "2.0")))
  }

  test("constants resolve $vars from conf and fail on unknown var") {
    val m = FieldMapping.parseString("x=$ds\ny=#9")
    assert(m.constants(Map("ds" -> "20240101")) ==
      Seq("x" -> "20240101", "y" -> "9"))
    val err = intercept[GraftError.Other](m.constants(Map.empty))
    assert(err.code == 9999)
  }

  test("validate drops missing sources under DropWarn, keeps order") {
    val m = FieldMapping.parseString("a=c1\nb=ghost\nc=c2\nv=#1")
    val (kept, dropped) = m.validate(Seq("c1", "c2"), MissingFieldPolicy.DropWarn)
    assert(kept.targets == Seq("a", "c", "v"))
    assert(dropped == Seq("b"))
  }

  test("validate aborts with 9997 under Fail policy (reference exit code)") {
    val m = FieldMapping.parseString("a=c1\nb=ghost")
    val err = intercept[GraftError.MissingSourceField](
      m.validate(Seq("c1"), MissingFieldPolicy.Fail))
    assert(err.code == 9997)
    assert(err.fields == Seq("ghost"))
  }

  test("malformed line is a typed 9999 error") {
    assert(intercept[GraftError.Other](
      FieldMapping.parseString("no_equals_here")).code == 9999)
  }
}

class DumpConfSpec extends AnyFunSuite {

  test("ds defaults to yesterday in the configured format when absent or ?") {
    val today = LocalDate.of(2026, 8, 12)
    assert(DumpConf(Map.empty).ds(today) == "20260811")
    assert(DumpConf(Map("ds" -> "?")).ds(today) == "20260811")
    assert(DumpConf(Map("ds" -> "20240101")).ds(today) == "20240101")
    assert(DumpConf(Map("ds_formater" -> "yyyy-MM-dd")).ds(today) == "2026-08-11")
  }

  test("policies map the reference flags, defaulting to the strict side") {
    assert(DumpConf(Map.empty).missingFieldPolicy == MissingFieldPolicy.Fail)
    assert(DumpConf(Map("error_if_src_field_not_exsits" -> "false"))
      .missingFieldPolicy == MissingFieldPolicy.DropWarn)
    assert(DumpConf(Map.empty).emptyDataPolicy == EmptyDataPolicy.Fail)
    assert(DumpConf(Map("error_if_none_data" -> "false"))
      .emptyDataPolicy == EmptyDataPolicy.Ok)
  }

  test("dry-run only on mode=test; batch size defaults to the reference 100") {
    assert(!DumpConf(Map("mode" -> "product")).dryRun)
    assert(DumpConf(Map("mode" -> "test")).dryRun)
    assert(DumpConf(Map.empty).batchSize == 100)
  }

  test("delete_before_dump defaults to FALSE like the reference") {
    // getProperty("delete_before_dump","false") — an omitted key must never
    // issue destructive keyed DELETEs the reference would not issue
    assert(!DumpConf(Map.empty).deleteBeforeDump)
    assert(DumpConf(Map("delete_before_dump" -> "true")).deleteBeforeDump)
  }

  test("mysqlTarget composes mysql_db.mysql_table like the reference INSERT") {
    assert(DumpConf(Map("mysql_table" -> "t")).mysqlTarget.contains("t"))
    assert(DumpConf(Map("mysql_db" -> "d", "mysql_table" -> "t"))
      .mysqlTarget.contains("d.t"))
    assert(DumpConf(Map("mysql_db" -> "d")).mysqlTarget.isEmpty)
  }

  test("parse takes last duplicate key and ignores comments") {
    val c = DumpConf.parseString("# c\nk=1\nk=2")
    assert(c.raw("k") == "2")
  }

  test("error exit codes cover the reference contract 9995-9999") {
    assert(GraftError.MissingHeader("x").code == 9995)
    assert(GraftError.RowWidthMismatch("x").code == 9996)
    assert(GraftError.MissingSourceField(Seq("f")).code == 9997)
    assert(GraftError.NoData("x").code == 9998)
    assert(GraftError.Other("x").code == 9999)
    assert(GraftError.exitCode(new RuntimeException) == 9999)
  }
}
