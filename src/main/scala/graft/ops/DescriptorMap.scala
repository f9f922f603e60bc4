package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The AMT descriptor-constant mapping table: (descriptor family, code
  * value) → universal constant name. Config-data parity with the
  * reference's 46-entry helper/descriptor_map/descriptor_map.json (loaded
  * by parquet/Common/descriptor_mapping.py:17-44); entries listed in the
  * same order. Duplicate rows (e.g. AttendanceEvent.Present twice) and
  * many-to-one code values (Unexcused Absence → both
  * AttendanceEvent.UnexcusedAbsence and AttendanceEvent.Absence) are
  * intentional — the reference's right-join fan-out depends on them
  * (SURVEY §7.4.6).
  */
object DescriptorMap {

  val entries: Seq[(String, String, String)] = Seq(
    ("Address.Mailing", "AddressTypeDescriptor", "Mailing"),
    ("Address.Physical", "AddressTypeDescriptor", "Physical"),
    ("Address.Work", "AddressTypeDescriptor", "Work"),
    ("AssignmentCategory.Assignment", "Schoology", "Assignment"),
    ("AssignmentCategory.Assignment", "Google", "Assignment"),
    ("AttendanceEvent.Present", "AttendanceEventCategoryDescriptor", "In Attendance"),
    ("AttendanceEvent.Tardy", "AttendanceEventCategoryDescriptor", "Tardy"),
    ("AttendanceEvent.UnexcusedAbsence", "AttendanceEventCategoryDescriptor", "Unexcused Absence"),
    ("AuthorizationScope.School", "StaffClassificationDescriptor", "Principal"),
    ("AuthorizationScope.Section", "StaffClassificationDescriptor", "Teacher"),
    ("Behavior.SchoolCodeOfConductOffense", "BehaviorDescriptor", "School Code of Conduct"),
    ("Behavior.StateOffense", "BehaviorDescriptor", "State Offense"),
    ("CalendarEvent.InstructionalDay", "CalendarEventDescriptor", "Instructional day"),
    ("CalendarEvent.InstructionalDay", "CalendarEventDescriptor", "Make-up day"),
    ("Email.Work", "ElectronicMailTypeDescriptor", "Work"),
    ("GradeType.GradingPeriod", "GradeTypeDescriptor", "Grading Period"),
    ("GradeType.Semester", "GradeTypeDescriptor", "Semester"),
    ("SubmissionStatus.IsPastDue", "Canvas", "missing"),
    ("SubmissionStatus.IsPastDue", "Google", "MISSING"),
    ("SubmissionStatus.SubmittedLate", "Schoology", "late"),
    ("SubmissionStatus.SubmittedLate", "Canvas", "late"),
    ("SubmissionStatus.SubmittedLate", "Google", "LATE"),
    ("SubmissionStatus.SubmittedOnTime", "Schoology", "on-time"),
    ("SubmissionStatus.SubmittedOnTime", "Canvas", "graded"),
    ("SubmissionStatus.SubmittedOnTime", "Canvas", "on-time"),
    ("SubmissionStatus.SubmittedOnTime", "Google", "TURNED_IN"),
    ("SubmissionStatus.SubmittedOnTime", "Google", "RETURNED"),
    ("SubmissionStatus.Upcoming", "Schoology", "Upcoming"),
    ("SubmissionStatus.Upcoming", "Canvas", "Upcoming"),
    ("SubmissionStatus.Upcoming", "Google", "NEW"),
    ("SubmissionStatus.Upcoming", "Google", "CREATED"),
    ("SubmissionStatus.Upcoming", "Google", "RECLAIMED_BY_STUDENT"),
    ("Telephone.Mobile", "TelephoneNumberTypeDescriptor", "Mobile"),
    ("Telephone.Work", "TelephoneNumberTypeDescriptor", "Work"),
    ("Telephone.Home", "TelephoneNumberTypeDescriptor", "Home"),
    ("SubmissionStatus.IsPastDue", "Schoology", "missing"),
    ("GradeType.Final", "GradeTypeDescriptor", "Final"),
    ("Email.Personal", "ElectronicMailTypeDescriptor", "Home/Personal"),
    ("AuthorizationScope.District", "StaffClassificationDescriptor", "Superintendent"),
    ("AttendanceEvent.ExcusedAbsence", "AttendanceEventCategoryDescriptor", "Excused Absence"),
    ("AssignmentCategory.Assignment", "Canvas", "Assignment"),
    ("Address.Temporary", "AddressTypeDescriptor", "Temporary"),
    ("Address.Home", "AddressTypeDescriptor", "Home"),
    ("AttendanceEvent.Present", "AttendanceEventCategoryDescriptor", "In Attendance"),
    ("AttendanceEvent.Absence", "AttendanceEventCategoryDescriptor", "Unexcused Absence"),
    ("AttendanceEvent.Absence", "AttendanceEventCategoryDescriptor", "Excused Absence")
  )

  def dataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("constantName", "descriptor", "codeValue")
  }

  /** `get_descriptor_constant` parity (descriptor_mapping.py:17-95): attach
    * `<uriCol>_constantName` by case-insensitive (descriptor, codeValue)
    * lookup on the parsed URI; unmapped rows keep null; multi-mapped code
    * values fan out. */
  def withConstant(data: DataFrame, uriCol: String): DataFrame =
    Descriptors.withConstant(
      data, dataFrame(data.sparkSession), uriCol, s"${uriCol}_constantName")
}
