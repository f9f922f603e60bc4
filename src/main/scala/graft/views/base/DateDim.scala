package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DateKeys
import graft.views.{AmtView, ViewContext}

/** AMT DateDim — reference parquet/amt/base/date_dim/main.py:35-160.
  *
  * Distinct calendar dates with string date parts. Parity notes:
  *   - Year/Month/Day come from *string* slicing of the ISO date
  *     (main.py:68 `str.split('-')`), so Month/Day keep zero padding;
  *   - DateKey is their concatenation (yyyyMMdd);
  *   - missing schoolYear → 'Unknown' (replace_null, main.py:147).
  */
object DateDim extends AmtView {
  val name = "dateDim"
  val collection = "base"
  val outputColumns = Seq(
    "DateKey", "Date", "Day", "Month", "MonthName",
    "CalendarQuarter", "CalendarQuarterName", "Year", "SchoolYear")
  val endpointDeps = Seq("calendarDates")

  def build(ctx: ViewContext): DataFrame = {
    val d = try_to_date(col("date"))
    ctx.endpoint("calendarDates")
      .select(col("date"), col("calendarReference.schoolYear").as("schoolYear"))
      .distinct()
      .select(
        concat(substring(col("date"), 1, 4), substring(col("date"), 6, 2),
          substring(col("date"), 9, 2)).as("DateKey"),
        d.as("Date"),
        substring(col("date"), 9, 2).as("Day"),
        substring(col("date"), 6, 2).as("Month"),
        DateKeys.monthName(col("date")).as("MonthName"),
        quarter(d).cast("string").as("CalendarQuarter"),
        DateKeys.quarterName(col("date")).as("CalendarQuarterName"),
        substring(col("date"), 1, 4).as("Year"),
        coalesce(col("schoolYear").cast("string"), lit("Unknown")).as("SchoolYear"))
      .select(outputColumns.map(col): _*)
  }
}
