package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.ops._

/** Unit tests for the operator-parity helpers (SURVEY.md §2 semantics). */
class OpsSpec extends SparkTestBase {
  import testImplicits._

  test("DateKeys.dateKey: date → yyyyMMdd, junk/null → empty string") {
    val df = Seq("2021-08-23", "not a date", null).toDF("d")
      .select(DateKeys.dateKey(col("d")).as("k"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("20210823", "", ""))
  }

  test("DateKeys.quarterName") {
    val df = Seq("2021-01-15", "2021-05-15", "2021-08-15", "2021-11-15").toDF("d")
      .select(DateKeys.quarterName(col("d")).as("q"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("First", "Second", "Third", "Fourth"))
  }

  test("Descriptors: URI parsers match the reference's string splits") {
    val uri = "uri://ed-fi.org/GradingPeriodDescriptor#First Six Weeks"
    val df = Seq(uri).toDF("u").select(
      Descriptors.codeValueFromUri(col("u")).as("cv"),
      Descriptors.descriptorNameFromUri(col("u")).as("dn"),
      Descriptors.idFromHref(lit("api/ed-fi/schools/abc123")).as("id"))
    val r = df.collect().head
    assert(r.getString(0) == "First Six Weeks")
    assert(r.getString(1) == "GradingPeriodDescriptor")
    assert(r.getString(2) == "abc123")
  }

  test("Descriptors.withConstant: case-insensitive match, unmapped survives as null") {
    val mapping = Seq(("Engagement.Click", "EventDescriptor", "CLICK"))
      .toDF("constantName", "descriptor", "codeValue")
    val data = Seq("uri://x/EventDescriptor#click", "uri://x/EventDescriptor#other")
      .toDF("uri")
    val out = Descriptors.withConstant(data, mapping, "uri")
      .orderBy("uri").collect()
    assert(out.length == 2)
    assert(out.map(_.getString(1)).toSeq == Seq("Engagement.Click", null))
  }

  test("Joins.merge: only colliding non-key columns get suffixed (pandas parity)") {
    val l = Seq((1, "a", "x")).toDF("k", "shared", "left_only")
    val r = Seq((1, "b", "y")).toDF("k", "shared", "right_only")
    val joined = Joins.mergeJoin(l, r, Seq("k"))
    assert(joined.columns.toSet ==
      Set("k", "shared_x", "left_only", "shared_y", "right_only"))
  }

  test("Crosstab.counts: fixed category list, absent categories zero-filled") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "cat")
    val out = Crosstab.counts(df, Seq("k"), "cat", Seq("a", "b", "c"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1, 2L, 0L, 0L), (2, 0L, 1L, 0L)))
  }

  test("OrderedAgg.stringAgg: explicit order, value tiebreak on duplicate keys") {
    val df = Seq((1, 2, "b"), (1, 1, "a"), (1, 2, "a2"), (1, 3, "c")).toDF("g", "k", "v")
    val out = df.groupBy("g")
      .agg(OrderedAgg.stringAgg(col("v"), ",", col("k")).as("r"))
      .collect().head.getString(1)
    assert(out == "a,a2,b,c")
  }

  test("Columns.replaceNullOrEmpty: fills null and '' and conjures absent columns") {
    val df = Seq(("x"), (""), (null)).toDF("c")
    val filled = Columns.replaceNullOrEmpty(df, "c", lit("n/a"))
      .collect().map(_.getString(0)).toSeq
    assert(filled == Seq("x", "n/a", "n/a"))
    val conjured = Columns.replaceNullOrEmpty(df, "missing", lit("d"))
    assert(conjured.columns.contains("missing"))
    assert(conjured.select("missing").collect().forall(_.getString(0) == "d"))
  }

  test("Columns.castAll") {
    val df = Seq((1, 2)).toDF("a", "b")
    val out = Columns.castAll(df, StringType, Seq("a", "b"))
    assert(out.schema.fields.forall(_.dataType == StringType))
  }

  test("Flatten.normalize: explode_outer keeps empty-array rows with null fields") {
    val df = spark.read.json(Seq(
      """{"id": 1, "arr": [{"v": "a"}, {"v": "b"}]}""",
      """{"id": 2, "arr": []}""").toDS())
    val out = Flatten.normalize(df, Seq("id"), Seq("arr"), Seq("v"), "arr_")
      .orderBy("id", "arr_v").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (1L, "b"), (2L, null)))
  }
}
