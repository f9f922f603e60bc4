package graft

import java.nio.file.{Files, Path}

import graft.runner.AmtPipeline

/** Golden-output tests for AMT views on hand-written silver fixtures
  * (FIXTURES.md shapes). Each view also gets the reference's structural
  * edge cases: empty-array file and missing endpoint directory
  * (SURVEY §7.4.1). */
class AmtViewsSpec extends SparkTestBase {

  private def silverWith(files: (String, String)*): Path = {
    val root = Files.createTempDirectory("silver")
    files.foreach { case (endpoint, json) =>
      val dir = root.resolve("2022").resolve(endpoint)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"${endpoint}_1.json"), json)
    }
    root
  }

  private val gradingPeriodsJson = """[
    {"schoolReference": {"schoolId": 255901001},
     "schoolYearTypeReference": {"schoolYear": 2022},
     "gradingPeriodDescriptor": "uri://ed-fi.org/GradingPeriodDescriptor#First Six Weeks",
     "beginDate": "2021-08-23", "endDate": "2021-10-01",
     "totalInstructionalDays": 29, "periodSequence": 1},
    {"schoolReference": {"schoolId": 255901001},
     "schoolYearTypeReference": {"schoolYear": 2022},
     "gradingPeriodDescriptor": "uri://ed-fi.org/GradingPeriodDescriptor#Second Six Weeks",
     "beginDate": "2021-10-04", "endDate": "2021-11-12",
     "totalInstructionalDays": 29, "periodSequence": 2}
  ]"""

  private val gradingPeriodDescriptorsJson = """[
    {"gradingPeriodDescriptorId": 123, "codeValue": "First Six Weeks",
     "description": "First Six Weeks", "namespace": "uri://ed-fi.org/GradingPeriodDescriptor",
     "shortDescription": "First Six Weeks"},
    {"gradingPeriodDescriptorId": 124, "codeValue": "Second Six Weeks",
     "description": "Second Six Weeks", "namespace": "uri://ed-fi.org/GradingPeriodDescriptor",
     "shortDescription": "Second Six Weeks"},
    {"gradingPeriodDescriptorId": 125, "codeValue": "Unmatched",
     "description": "Unmatched", "namespace": "uri://ed-fi.org/GradingPeriodDescriptor",
     "shortDescription": "Unmatched"}
  ]"""

  test("gradingPeriodDim: join, surrogate key, date keys (golden)") {
    val silver = silverWith(
      "gradingPeriods" -> gradingPeriodsJson,
      "gradingPeriodDescriptors" -> gradingPeriodDescriptorsJson)
    val p = new AmtPipeline(spark, silver.toString, "2022")
    val rows = p.view("gradingPeriodDim").orderBy("PeriodSequence").collect()
    assert(rows.length == 2) // inner join drops the unmatched descriptor
    val r = rows.head
    assert(r.getAs[String]("GradingPeriodKey") == "123-255901001-20210823")
    assert(r.getAs[String]("GradingPeriodBeginDateKey") == "20210823")
    assert(r.getAs[String]("GradingPeriodEndDateKey") == "20211001")
    assert(r.getAs[String]("GradingPeriodDescription") == "First Six Weeks")
    assert(r.getAs[Long]("TotalInstructionalDays") == 29L)
    assert(r.getAs[String]("SchoolKey") == "255901001")
    assert(r.getAs[String]("SchoolYear") == "2022")
  }

  test("gradingPeriodDim: empty-array and missing-endpoint inputs → empty frame, full schema") {
    val emptyFile = silverWith(
      "gradingPeriods" -> "[]",
      "gradingPeriodDescriptors" -> gradingPeriodDescriptorsJson)
    val p1 = new AmtPipeline(spark, emptyFile.toString, "2022")
    val df1 = p1.view("gradingPeriodDim")
    assert(df1.columns.toSeq == graft.views.base.GradingPeriodDim.outputColumns)
    assert(df1.count() == 0)

    val missingDir = silverWith("gradingPeriodDescriptors" -> gradingPeriodDescriptorsJson)
    val p2 = new AmtPipeline(spark, missingDir.toString, "2022")
    assert(p2.view("gradingPeriodDim").count() == 0)
  }

  test("dateDim: string date parts, zero padding, Unknown school year (golden)") {
    val silver = silverWith("calendarDates" -> """[
      {"date": "2021-08-23",
       "calendarReference": {"schoolId": 255901001, "schoolYear": 2022, "calendarCode": "IEP"},
       "calendarEvents": [{"calendarEventDescriptor": "uri://ed-fi.org/CalendarEventDescriptor#Instructional day"}]},
      {"date": "2021-08-23",
       "calendarReference": {"schoolId": 255901002, "schoolYear": 2022, "calendarCode": "IEP"},
       "calendarEvents": []},
      {"date": "2022-01-05", "calendarReference": {"schoolId": 1}, "calendarEvents": []}
    ]""")
    val p = new AmtPipeline(spark, silver.toString, "2022")
    val rows = p.view("dateDim").orderBy("DateKey").collect()
    assert(rows.length == 2) // same (date, schoolYear) pair deduplicated
    val aug = rows.head
    assert(aug.getAs[String]("DateKey") == "20210823")
    assert(aug.getAs[String]("Day") == "23" && aug.getAs[String]("Month") == "08")
    assert(aug.getAs[String]("MonthName") == "August")
    assert(aug.getAs[String]("CalendarQuarter") == "3")
    assert(aug.getAs[String]("CalendarQuarterName") == "Third")
    assert(aug.getAs[String]("Year") == "2021")
    assert(aug.getAs[String]("SchoolYear") == "2022")
    val jan = rows(1)
    assert(jan.getAs[String]("SchoolYear") == "Unknown")
    assert(jan.getAs[String]("CalendarQuarterName") == "First")
  }

  test("mostRecentGradingPeriod: group max over the gradingPeriodDim view") {
    val silver = silverWith(
      "gradingPeriods" -> gradingPeriodsJson,
      "gradingPeriodDescriptors" -> gradingPeriodDescriptorsJson)
    val p = new AmtPipeline(spark, silver.toString, "2022")
    val rows = p.view("mostRecentGradingPeriod").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("SchoolKey") == "255901001")
    assert(rows.head.getAs[String]("GradingPeriodBeginDateKey") == "20211004")
  }

  test("writeAll produces one gold parquet per view") {
    val silver = silverWith(
      "gradingPeriods" -> gradingPeriodsJson,
      "gradingPeriodDescriptors" -> gradingPeriodDescriptorsJson)
    val gold = Files.createTempDirectory("gold")
    new AmtPipeline(spark, silver.toString, "2022").writeAll(gold.toString)
    val written = spark.read.parquet(s"$gold/2022/gradingPeriodDim.parquet")
    assert(written.count() == 2)
  }
}
