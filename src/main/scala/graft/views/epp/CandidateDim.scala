package graft.views.epp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Descriptors
import graft.views.{AmtView, ViewContext}

/** AMT epp.CandidateDim — reference
  * parquet/amt/epp/candidate_dim/main.py:53-365: educator-preparation
  * candidates × their program enrollments, decorated with demographics and
  * linked student identity.
  *
  * Shape: candidates ⋈(inner) program associations, then left joins for
  * cohort years (candidate+program), races fan-out, student identity
  * (students ⋈ people by personId), credentials (only rows whose tpdm
  * extension carries a personId, main.py:184-186), and the race/sex
  * descriptor tables matched by full `namespace#codeValue` URI
  * (main.py:95,110). Descriptor lookups are broadcast; the only fact-sized
  * shuffles are the candidate-keyed joins, which all share one key.
  *
  * Parity notes:
  *   - CohortYearTermDescription is ALWAYS '' — the reference selects a
  *     column that never exists and `replace_null` conjures it empty
  *     (main.py:303,323); kept for schema parity.
  *   - ProgramComplete = 1 iff the exit reason's code value is 'Completed'
  *     (main.py:336).
  *   - The final group-by over all output columns taking min(issuanceDate)
  *     (main.py:362-364, SURVEY A3) collapses the credential fan-out to
  *     distinct rows; IssuanceDate itself is not an output column.
  *   - Numeric keys render as plain integer strings ('607', not pandas'
  *     float-tainted '607.0').
  */
object CandidateDim extends AmtView {
  val name = "epp_candidateDim"
  val collection = "epp"
  val outputColumns = Seq(
    "CandidateKey", "FirstName", "LastSurname", "SexDescriptorKey",
    "SexDescriptor", "RaceDescriptorKey", "RaceDescriptor",
    "HispanicLatinoEthnicity", "EconomicDisadvantaged", "Cohort",
    "ProgramComplete", "StudentKey", "ProgramName", "BeginDate",
    "EducationOrganizationId", "PersonId", "CohortYearTermDescription",
    "EducationOrganizationKey")
  val endpointDeps = Seq(
    "candidates", "students", "people", "credentials",
    "candidateEducatorPreparationProgramAssociations",
    "raceDescriptors", "sexDescriptors")

  def build(ctx: ViewContext): DataFrame = {
    val candidates = ctx.endpoint("candidates").select(
      col("candidateIdentifier"),
      col("personReference.personId").as("personId"),
      col("firstName"), col("lastSurname"), col("sexDescriptor"),
      col("hispanicLatinoEthnicity"), col("economicDisadvantaged"))

    val candidateRaces = ctx.endpoint("candidates").select(
      col("candidateIdentifier"),
      explode(col("races")).as("r"))
      .select(col("candidateIdentifier"), col("r.raceDescriptor").as("raceUri"))

    val cepp = ctx.endpoint("candidateEducatorPreparationProgramAssociations")
    val assoc = cepp.select(
      col("candidateReference.candidateIdentifier").as("candidateIdentifier"),
      col("educatorPreparationProgramReference.programName").as("ProgramName"),
      col("educatorPreparationProgramReference.educationOrganizationId")
        .as("edOrgId"),
      col("beginDate"),
      Descriptors.codeValueFromUri(coalesce(col("reasonExitedDescriptor"), lit("")))
        .as("reasonExited"))
    val cohortYears = cepp.select(
      col("candidateReference.candidateIdentifier").as("candidateIdentifier"),
      col("educatorPreparationProgramReference.programName").as("ProgramName"),
      explode(col("cohortYears")).as("cy"))
      .select(col("candidateIdentifier"), col("ProgramName"),
        col("cy.schoolYearTypeReference.schoolYear").as("cohortYear"))

    val studentPerson = ctx.endpoint("students")
      .select(col("studentUniqueId"),
        col("personReference.personId").as("personId"))
      .join(ctx.endpoint("people").select(col("personId")), Seq("personId"), "inner")

    val credentials = ctx.endpoint("credentials")
      .select(col("_ext.tpdm.personReference.personId").as("personId"),
        col("issuanceDate"))
      .filter(col("personId").isNotNull && col("personId") =!= "")

    val raceDesc = ctx.endpoint("raceDescriptors").select(
      concat(col("namespace"), lit("#"), col("codeValue")).as("raceUri"),
      col("raceDescriptorId"), col("codeValue").as("raceCode"))
    val sexDesc = ctx.endpoint("sexDescriptors").select(
      concat(col("namespace"), lit("#"), col("codeValue")).as("sexDescriptor"),
      col("sexDescriptorId"), col("codeValue").as("sexCode"))

    def blankStr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(c.cast("string"), lit(""))

    candidates
      .join(assoc, Seq("candidateIdentifier"), "inner")
      .join(cohortYears, Seq("candidateIdentifier", "ProgramName"), "left")
      .join(candidateRaces, Seq("candidateIdentifier"), "left")
      .join(studentPerson, Seq("personId"), "left")
      .join(credentials, Seq("personId"), "left")
      .join(broadcast(raceDesc), Seq("raceUri"), "left")
      .join(broadcast(sexDesc), Seq("sexDescriptor"), "left")
      .select(
        col("candidateIdentifier").as("CandidateKey"),
        col("firstName").as("FirstName"),
        col("lastSurname").as("LastSurname"),
        blankStr(col("sexDescriptorId")).as("SexDescriptorKey"),
        blankStr(col("sexCode")).as("SexDescriptor"),
        blankStr(col("raceDescriptorId")).as("RaceDescriptorKey"),
        blankStr(col("raceCode")).as("RaceDescriptor"),
        coalesce(col("hispanicLatinoEthnicity"), lit(false)).cast("int")
          .as("HispanicLatinoEthnicity"),
        coalesce(col("economicDisadvantaged"), lit(false)).cast("int")
          .as("EconomicDisadvantaged"),
        blankStr(col("cohortYear")).as("Cohort"),
        when(col("reasonExited") === "Completed", 1).otherwise(0)
          .as("ProgramComplete"),
        blankStr(col("studentUniqueId")).as("StudentKey"),
        col("ProgramName"),
        blankStr(col("beginDate")).as("BeginDate"),
        blankStr(col("edOrgId")).as("EducationOrganizationId"),
        col("personId").as("PersonId"),
        lit("").as("CohortYearTermDescription"),
        blankStr(col("edOrgId")).as("EducationOrganizationKey"),
        col("issuanceDate"))
      .groupBy(outputColumns.map(col): _*)
      .agg(min(col("issuanceDate")).as("IssuanceDate"))
      .select(outputColumns.map(col): _*)
  }
}
