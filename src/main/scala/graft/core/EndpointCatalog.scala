package graft.core

import org.apache.spark.sql.types._

/** Explicit schemas for the Ed-Fi ODS endpoints the AMT views consume.
  *
  * The reference infers structure row-by-row with pandas json_normalize and
  * patches missing columns afterwards (reference
  * parquet/Common/pandasWrapper.py:47-85). Declaring StructTypes instead
  * makes the "declared columns always exist" contract structural:
  * `spark.read.schema(...)` yields the full schema even for empty or
  * field-missing files, and the JSON scan prunes to consumed fields.
  * Endpoint census from reference helper/endpoint/endpoint.json:1-82.
  */
object EndpointCatalog {

  private def s(fields: StructField*): StructType = StructType(fields)
  private def f(name: String, t: DataType): StructField = StructField(name, t, nullable = true)
  private def arr(t: DataType): ArrayType = ArrayType(t, containsNull = true)

  private val link = s(f("rel", StringType), f("href", StringType))
  private val sectionReference = s(
    f("localCourseCode", StringType), f("schoolId", LongType),
    f("schoolYear", LongType), f("sectionIdentifier", StringType),
    f("sessionName", StringType), f("link", link))

  val schemas: Map[String, StructType] = Map(
    "gradingPeriods" -> s(
      f("id", StringType),
      f("schoolReference", s(f("schoolId", LongType))),
      f("schoolYearTypeReference", s(f("schoolYear", LongType))),
      f("gradingPeriodDescriptor", StringType),
      f("beginDate", StringType), f("endDate", StringType),
      f("totalInstructionalDays", LongType), f("periodSequence", LongType)),
    "sessions" -> s(
      f("id", StringType), f("sessionName", StringType),
      f("beginDate", StringType), f("endDate", StringType),
      f("termDescriptor", StringType),
      f("schoolReference", s(f("schoolId", LongType))),
      f("schoolYearTypeReference", s(f("schoolYear", LongType))),
      f("gradingPeriods", arr(s(
        f("gradingPeriodReference", s(
          f("schoolId", LongType), f("schoolYear", LongType),
          f("gradingPeriodDescriptor", StringType),
          f("periodSequence", LongType), f("link", link))))))),
    "gradingPeriodDescriptors" -> descriptorSchema("gradingPeriodDescriptorId"),
    "termDescriptors" -> descriptorSchema("termDescriptorId"),
    "raceDescriptors" -> descriptorSchema("raceDescriptorId"),
    "sexDescriptors" -> descriptorSchema("sexDescriptorId"),
    "cohortTypeDescriptors" -> descriptorSchema("cohortTypeDescriptorId"),
    "cohortYearTypeDescriptors" -> descriptorSchema("cohortYearTypeDescriptorId"),
    "disabilityDesignationDescriptors" -> descriptorSchema("disabilityDesignationDescriptorId"),
    "languageUseDescriptors" -> descriptorSchema("languageUseDescriptorId"),
    "disabilityDescriptors" -> descriptorSchema("disabilityDescriptorId"),
    "languageDescriptors" -> descriptorSchema("languageDescriptorId"),
    "studentCharacteristicDescriptors" -> descriptorSchema("studentCharacteristicDescriptorId"),
    "tribalAffiliationDescriptors" -> descriptorSchema("tribalAffiliationDescriptorId"),
    "schoolYearTypes" -> s(
      f("schoolYear", LongType), f("currentSchoolYear", BooleanType),
      f("schoolYearDescription", StringType)),
    "calendarDates" -> s(
      f("date", StringType),
      f("calendarReference", s(
        f("schoolId", LongType), f("schoolYear", LongType), f("calendarCode", StringType))),
      f("calendarEvents", arr(s(f("calendarEventDescriptor", StringType))))),
    "studentSchoolAssociations" -> s(
      f("id", StringType),
      f("schoolReference", s(f("schoolId", LongType))),
      f("schoolYearTypeReference", s(f("schoolYear", LongType))),
      f("calendarReference", s(f("calendarCode", StringType))),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("entryDate", StringType), f("exitWithdrawDate", StringType),
      f("entryGradeLevelDescriptor", StringType)),
    "studentSectionAssociations" -> s(
      f("sectionReference", sectionReference),
      f("studentReference", s(f("studentUniqueId", StringType), f("link", link))),
      f("beginDate", StringType), f("endDate", StringType),
      f("homeroomIndicator", BooleanType)),
    "studentSchoolAttendanceEvents" -> s(
      f("id", StringType),
      f("schoolReference", s(f("schoolId", LongType))),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("sessionReference", s(f("schoolYear", LongType))),
      f("eventDate", StringType),
      f("attendanceEventCategoryDescriptor", StringType)),
    "studentSectionAttendanceEvents" -> s(
      f("schoolReference", s(f("schoolId", LongType))),
      f("sectionReference", sectionReference),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("eventDate", StringType),
      f("attendanceEventCategoryDescriptor", StringType),
      f("educationalEnvironmentDescriptor", StringType)),
    "schools" -> s(
      f("schoolId", LongType), f("nameOfInstitution", StringType),
      f("schoolTypeDescriptor", StringType),
      f("localEducationAgencyReference", s(f("localEducationAgencyId", LongType))),
      f("addresses", arr(s(
        f("addressTypeDescriptor", StringType),
        f("stateAbbreviationDescriptor", StringType),
        f("streetNumberName", StringType), f("city", StringType),
        f("nameOfCounty", StringType), f("postalCode", StringType)))),
      f("gradeLevels", arr(s(f("gradeLevelDescriptor", StringType)))),
      f("educationOrganizationCategories", arr(s(
        f("educationOrganizationCategoryDescriptor", StringType))))),
    "localEducationAgencies" -> s(
      f("id", StringType),
      f("localEducationAgencyId", LongType), f("nameOfInstitution", StringType),
      f("localEducationAgencyCategoryDescriptor", StringType),
      f("charterStatusDescriptor", StringType),
      f("parentLocalEducationAgencyReference", s(f("localEducationAgencyId", LongType))),
      f("educationServiceCenterReference",
        s(f("educationServiceCenterId", LongType), f("link", link))),
      f("stateEducationAgencyReference",
        s(f("stateEducationAgencyId", LongType), f("link", link)))),
    "educationServiceCenters" -> s(
      f("id", StringType),
      f("educationServiceCenterId", LongType), f("nameOfInstitution", StringType),
      f("stateEducationAgencyReference", s(f("stateEducationAgencyId", LongType)))),
    "stateEducationAgencies" -> s(
      f("id", StringType),
      f("stateEducationAgencyId", LongType), f("nameOfInstitution", StringType)),
    "grades" -> s(
      f("gradingPeriodReference", s(
        f("gradingPeriodDescriptor", StringType), f("periodSequence", LongType),
        f("schoolId", LongType), f("schoolYear", LongType))),
      f("studentSectionAssociationReference", s(
        f("studentUniqueId", StringType), f("schoolId", LongType),
        f("beginDate", StringType), f("localCourseCode", StringType),
        f("schoolYear", LongType), f("sectionIdentifier", StringType),
        f("sessionName", StringType))),
      f("gradeTypeDescriptor", StringType),
      f("numericGradeEarned", DoubleType), f("letterGradeEarned", StringType)),
    "disciplineIncidents" -> s(
      f("schoolReference", s(f("schoolId", LongType))),
      f("incidentIdentifier", StringType), f("incidentDate", StringType)),
    "studentDisciplineIncidentBehaviorAssociations" -> s(
      f("disciplineIncidentReference", s(
        f("incidentIdentifier", StringType), f("schoolId", LongType))),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("behaviorDescriptor", StringType)),
    "students" -> s(
      f("id", StringType),
      f("studentUniqueId", StringType), f("firstName", StringType),
      f("lastSurname", StringType), f("middleName", StringType),
      f("birthDate", StringType),
      f("personReference", s(f("personId", StringType), f("link", link)))),
    "candidates" -> s(
      f("candidateIdentifier", StringType),
      f("firstName", StringType), f("lastSurname", StringType),
      f("sexDescriptor", StringType),
      f("hispanicLatinoEthnicity", BooleanType),
      f("economicDisadvantaged", BooleanType),
      f("races", arr(s(f("raceDescriptor", StringType)))),
      f("personReference", s(f("personId", StringType), f("link", link)))),
    "people" -> s(f("id", StringType), f("personId", StringType)),
    "credentials" -> s(
      f("id", StringType), f("credentialIdentifier", StringType),
      f("issuanceDate", StringType),
      f("_ext", s(f("tpdm", s(
        f("personReference", s(f("personId", StringType), f("link", link)))))))),
    "candidateEducatorPreparationProgramAssociations" -> s(
      f("id", StringType), f("beginDate", StringType),
      f("reasonExitedDescriptor", StringType),
      f("candidateReference", s(f("candidateIdentifier", StringType), f("link", link))),
      f("educatorPreparationProgramReference", s(
        f("programName", StringType), f("educationOrganizationId", LongType),
        f("link", link))),
      f("cohortYears", arr(s(
        f("cohortYearTypeDescriptor", StringType),
        f("schoolYearTypeReference", s(f("schoolYear", LongType))))))),
    "surveys" -> s(
      f("id", StringType), f("surveyIdentifier", StringType),
      f("surveyTitle", StringType)),
    "surveyQuestions" -> s(
      f("id", StringType), f("questionCode", StringType),
      f("questionText", StringType),
      f("surveySectionReference", s(
        f("surveyIdentifier", StringType), f("surveySectionTitle", StringType))),
      f("surveyReference", s(f("surveyIdentifier", StringType), f("link", link)))),
    "surveyResponses" -> s(
      f("id", StringType), f("responseDate", StringType),
      f("surveyResponseIdentifier", StringType),
      f("surveyReference", s(f("surveyIdentifier", StringType), f("link", link))),
      f("studentReference", s(f("studentUniqueId", StringType), f("link", link)))),
    "surveyQuestionResponses" -> s(
      f("id", StringType),
      f("surveyQuestionReference", s(
        f("questionCode", StringType), f("surveyIdentifier", StringType),
        f("link", link))),
      f("surveyResponseReference", s(
        f("surveyResponseIdentifier", StringType), f("link", link))),
      f("surveyQuestionMatrixElementResponses", arr(s(
        f("numericResponse", LongType), f("textResponse", StringType))))),
    "surveyResponsePersonTargetAssociations" -> s(
      f("surveyResponseReference", s(
        f("surveyResponseIdentifier", StringType), f("link", link))),
      f("personReference", s(f("personId", StringType), f("link", link)))),
    "evaluationObjectives" -> s(
      f("id", StringType), f("evaluationObjectiveTitle", StringType)),
    "evaluationElementRatings" -> s(
      f("id", StringType),
      f("evaluationObjectiveRatingReference", s(
        f("personId", StringType), f("evaluationDate", StringType),
        f("evaluationObjectiveTitle", StringType))),
      f("evaluationElementReference", s(
        f("performanceEvaluationTitle", StringType),
        f("evaluationElementTitle", StringType),
        f("termDescriptor", StringType), f("schoolYear", LongType),
        f("evaluationTitle", StringType))),
      f("results", arr(s(
        f("ratingResultTitle", StringType), f("rating", DoubleType))))),
    "financialAids" -> s(
      f("beginDate", StringType), f("endDate", StringType),
      f("aidConditionDescription", StringType),
      f("aidTypeDescriptor", StringType),
      f("aidAmount", DoubleType),
      f("pellGrantRecipient", BooleanType),
      f("studentReference", s(f("studentUniqueId", StringType), f("link", link)))),
    "aidTypeDescriptors" -> descriptorSchema("aidTypeDescriptorId"),
    "cohorts" -> s(
      f("id", StringType), f("cohortIdentifier", StringType),
      f("cohortDescription", StringType), f("cohortTypeDescriptor", StringType),
      f("educationOrganizationReference",
        s(f("educationOrganizationId", LongType), f("link", link))),
      f("programs", arr(s(
        f("programReference", s(
          f("educationOrganizationId", LongType), f("programName", StringType),
          f("programTypeDescriptor", StringType), f("link", link))))))),
    "studentCohortAssociations" -> s(
      f("id", StringType), f("beginDate", StringType), f("endDate", StringType),
      f("cohortReference", s(
        f("cohortIdentifier", StringType),
        f("educationOrganizationId", LongType), f("link", link))),
      f("studentReference", s(f("studentUniqueId", StringType), f("link", link)))),
    "parents" -> s(
      f("id", StringType), f("parentUniqueId", StringType),
      f("firstName", StringType), f("lastSurname", StringType),
      f("addresses", arr(s(
        f("addressTypeDescriptor", StringType), f("city", StringType),
        f("postalCode", StringType), f("stateAbbreviationDescriptor", StringType),
        f("streetNumberName", StringType), f("nameOfCounty", StringType),
        f("apartmentRoomSuiteNumber", StringType),
        f("periods", arr(s(f("beginDate", StringType), f("endDate", StringType))))))),
      f("telephones", arr(s(
        f("telephoneNumber", StringType),
        f("telephoneNumberTypeDescriptor", StringType)))),
      f("electronicMails", arr(s(
        f("electronicMailAddress", StringType),
        f("electronicMailTypeDescriptor", StringType),
        f("primaryEmailAddressIndicator", BooleanType))))),
    "studentParentAssociations" -> s(
      f("id", StringType),
      f("parentReference", s(f("parentUniqueId", StringType), f("link", link))),
      f("studentReference", s(f("studentUniqueId", StringType), f("link", link))),
      f("primaryContactStatus", BooleanType), f("livesWith", BooleanType),
      f("emergencyContactStatus", BooleanType),
      f("contactPriority", LongType), f("contactRestrictions", StringType),
      f("relationDescriptor", StringType)),
    "staffs" -> s(
      f("id", StringType), f("staffUniqueId", StringType),
      f("personalTitlePrefix", StringType),
      f("firstName", StringType), f("middleName", StringType),
      f("lastSurname", StringType), f("birthDate", StringType),
      f("sexDescriptor", StringType),
      f("hispanicLatinoEthnicity", BooleanType),
      f("highestCompletedLevelOfEducationDescriptor", StringType),
      f("yearsOfPriorProfessionalExperience", DoubleType),
      f("yearsOfPriorTeachingExperience", DoubleType),
      f("highlyQualifiedTeacher", BooleanType),
      f("loginId", StringType),
      f("races", arr(s(f("raceDescriptor", StringType)))),
      f("electronicMails", arr(s(
        f("electronicMailAddress", StringType),
        f("electronicMailTypeDescriptor", StringType))))),
    "staffSectionAssociations" -> s(
      f("id", StringType),
      f("staffReference", s(f("staffUniqueId", StringType), f("link", link))),
      f("sectionReference", sectionReference),
      f("beginDate", StringType), f("endDate", StringType),
      f("classroomPositionDescriptor", StringType)),
    "staffEducationOrganizationAssignmentAssociations" -> s(
      f("staffReference", s(f("staffUniqueId", StringType), f("link", link))),
      f("educationOrganizationReference",
        s(f("educationOrganizationId", LongType), f("link", link))),
      f("staffClassificationDescriptor", StringType),
      f("beginDate", StringType), f("endDate", StringType)),
    "sections" -> s(
      f("id", StringType),
      f("courseOfferingReference", s(
        f("localCourseCode", StringType), f("schoolId", LongType),
        f("schoolYear", LongType), f("sessionName", StringType), f("link", link))),
      f("sectionIdentifier", StringType), f("sectionName", StringType),
      f("educationalEnvironmentDescriptor", StringType),
      f("classPeriods", arr(s(
        f("classPeriodReference", s(f("classPeriodName", StringType))))))),
    "assessments" -> s(
      f("assessmentIdentifier", StringType), f("namespace", StringType),
      f("assessmentCategoryDescriptor", StringType),
      f("assessmentTitle", StringType), f("assessmentVersion", LongType),
      f("assessedGradeLevels", arr(s(f("gradeLevelDescriptor", StringType)))),
      f("scores", arr(s(
        f("assessmentReportingMethodDescriptor", StringType),
        f("maximumScore", StringType), f("minimumScore", StringType),
        f("resultDatatypeTypeDescriptor", StringType)))),
      f("academicSubjects", arr(s(f("academicSubjectDescriptor", StringType))))),
    "objectiveAssessments" -> s(
      f("assessmentReference", s(
        f("assessmentIdentifier", StringType), f("namespace", StringType))),
      f("identificationCode", StringType),
      f("parentObjectiveAssessmentReference", s(
        f("assessmentIdentifier", StringType),
        f("identificationCode", StringType), f("namespace", StringType))),
      f("description", StringType), f("percentOfAssessment", DoubleType),
      f("scores", arr(s(
        f("assessmentReportingMethodDescriptor", StringType),
        f("maximumScore", StringType), f("minimumScore", StringType),
        f("resultDatatypeTypeDescriptor", StringType)))),
      f("learningStandards", arr(s(
        f("learningStandardReference", s(
          f("learningStandardId", StringType), f("link", link))))))),
    "studentAssessments" -> s(
      f("id", StringType),
      f("studentAssessmentIdentifier", StringType),
      f("administrationDate", StringType),
      f("assessmentReference", s(
        f("assessmentIdentifier", StringType), f("namespace", StringType))),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("whenAssessedGradeLevelDescriptor", StringType),
      f("scoreResults", arr(s(
        f("assessmentReportingMethodDescriptor", StringType),
        f("result", StringType), f("resultDatatypeTypeDescriptor", StringType)))),
      f("performanceLevels", arr(s(
        f("assessmentReportingMethodDescriptor", StringType),
        f("performanceLevelDescriptor", StringType),
        f("performanceLevelMet", BooleanType)))),
      f("studentObjectiveAssessments", arr(s(
        f("objectiveAssessmentReference", s(f("identificationCode", StringType))),
        f("scoreResults", arr(s(
          f("assessmentReportingMethodDescriptor", StringType),
          f("result", StringType), f("resultDatatypeTypeDescriptor", StringType)))),
        f("performanceLevels", arr(s(
          f("assessmentReportingMethodDescriptor", StringType),
          f("performanceLevelDescriptor", StringType),
          f("performanceLevelMet", BooleanType)))))))),
    "performanceLevelDescriptors" -> descriptorSchema("performanceLevelDescriptorId"),
    "assessmentCategoryDescriptors" -> descriptorSchema("assessmentCategoryDescriptorId"),
    "gradeLevelDescriptors" -> descriptorSchema("gradeLevelDescriptorId"),
    "assessmentReportingMethodDescriptors" -> descriptorSchema("assessmentReportingMethodDescriptorId"),
    "resultDatatypeTypeDescriptors" -> descriptorSchema("resultDatatypeTypeDescriptorId"),
    "disciplineActions" -> s(
      f("disciplineActionIdentifier", StringType),
      f("disciplineDate", StringType),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("disciplines", arr(s(f("disciplineDescriptor", StringType)))),
      f("staffs", arr(s(
        f("staffReference", s(f("staffUniqueId", StringType), f("link", link))))))),
    "disciplineDescriptors" -> descriptorSchema("disciplineDescriptorId"),
    "programs" -> s(
      f("id", StringType), f("programName", StringType),
      f("programTypeDescriptor", StringType),
      f("educationOrganizationReference", s(f("educationOrganizationId", LongType)))),
    "programTypeDescriptors" -> descriptorSchema("programTypeDescriptorId"),
    "schoolFoodServiceProgramServiceDescriptors" ->
      descriptorSchema("schoolFoodServiceProgramServiceDescriptorId"),
    "studentSchoolFoodServiceProgramAssociations" -> s(
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("programReference", s(
        f("programName", StringType), f("programTypeDescriptor", StringType),
        f("educationOrganizationId", LongType))),
      f("educationOrganizationReference", s(f("educationOrganizationId", LongType))),
      f("beginDate", StringType),
      f("schoolFoodServiceProgramServices", arr(s(
        f("schoolFoodServiceProgramServiceDescriptor", StringType))))),
    "studentProgramAssociations" -> s(
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("beginDate", StringType), f("endDate", StringType),
      f("programReference", s(
        f("programName", StringType), f("programTypeDescriptor", StringType),
        f("educationOrganizationId", LongType), f("link", link))),
      f("educationOrganizationReference", s(f("educationOrganizationId", LongType)))),
    "feederSchoolAssociations" -> s(
      f("feederSchoolReference", s(f("schoolId", LongType))),
      f("schoolReference", s(f("schoolId", LongType))),
      f("beginDate", StringType), f("endDate", StringType)),
    "courses" -> s(
      f("id", StringType), f("courseCode", StringType),
      f("courseTitle", StringType),
      f("academicSubjectDescriptor", StringType),
      f("educationOrganizationReference", s(f("educationOrganizationId", LongType)))),
    "courseOfferings" -> s(
      f("id", StringType),
      f("courseReference", s(f("courseCode", StringType), f("link", link))),
      f("sessionReference", s(f("sessionName", StringType), f("link", link))),
      f("schoolReference", s(f("schoolId", LongType), f("link", link)))),
    "educationalEnvironmentDescriptors" -> descriptorSchema("educationalEnvironmentDescriptorId"),
    "academicSubjectDescriptors" -> s(
      f("academicSubjectDescriptorId", LongType), f("codeValue", StringType),
      f("description", StringType), f("namespace", StringType),
      f("shortDescription", StringType)),
    "studentEducationOrganizationAssociations" -> s(
      f("id", StringType),
      f("educationOrganizationReference", s(f("educationOrganizationId", LongType))),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("limitedEnglishProficiencyDescriptor", StringType),
      f("hispanicLatinoEthnicity", BooleanType),
      f("sexDescriptor", StringType),
      f("races", arr(s(f("raceDescriptor", StringType)))),
      f("studentCharacteristics", arr(s(
        f("studentCharacteristicDescriptor", StringType),
        f("periods", arr(s(f("beginDate", StringType), f("endDate", StringType))))))),
      f("cohortYears", arr(s(
        f("cohortYearTypeDescriptor", StringType),
        f("schoolYearTypeReference", s(f("schoolYear", LongType)))))),
      f("languages", arr(s(
        f("languageDescriptor", StringType),
        f("uses", arr(s(f("languageUseDescriptor", StringType))))))),
      f("disabilities", arr(s(
        f("disabilityDescriptor", StringType),
        f("designations", arr(s(f("disabilityDesignationDescriptor", StringType))))))),
      f("tribalAffiliations", arr(s(f("tribalAffiliationDescriptor", StringType)))),
      f("studentIndicators", arr(s(
        f("indicatorName", StringType), f("indicator", StringType),
        f("indicatorGroup", StringType)))))
  )

  /** Schemas for census endpoints no AMT view consumes (extracted for
    * completeness — reference endpoint.json rows without a downstream
    * reader). Kept minimal: id + the references that identify the row. */
  private val extractionOnlySchemas: Map[String, StructType] = Map(
    "addressTypeDescriptors" -> descriptorSchema("addressTypeDescriptorId"),
    "schoolTypeDescriptors" -> descriptorSchema("schoolTypeDescriptorId"),
    "stateAbbreviationDescriptors" -> descriptorSchema("stateAbbreviationDescriptorId"),
    "calendars" -> s(
      f("id", StringType), f("calendarCode", StringType),
      f("schoolReference", s(f("schoolId", LongType))),
      f("schoolYearTypeReference", s(f("schoolYear", LongType))),
      f("calendarTypeDescriptor", StringType)),
    "staffDisciplineIncidentAssociations" -> s(
      f("id", StringType),
      f("staffReference", s(f("staffUniqueId", StringType), f("link", link))),
      f("disciplineIncidentReference", s(
        f("schoolId", LongType), f("incidentIdentifier", StringType)))),
    "staffSchoolAssociations" -> s(
      f("id", StringType),
      f("staffReference", s(f("staffUniqueId", StringType), f("link", link))),
      f("schoolReference", s(f("schoolId", LongType))),
      f("programAssignmentDescriptor", StringType)),
    "studentLanguageInstructionProgramAssociations" -> s(
      f("id", StringType), f("beginDate", StringType), f("endDate", StringType),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("programReference", s(
        f("programName", StringType), f("programTypeDescriptor", StringType),
        f("educationOrganizationId", LongType)))),
    "studentSpecialEducationProgramAssociations" -> s(
      f("id", StringType), f("beginDate", StringType), f("endDate", StringType),
      f("studentReference", s(f("studentUniqueId", StringType))),
      f("programReference", s(
        f("programName", StringType), f("programTypeDescriptor", StringType),
        f("educationOrganizationId", LongType))),
      f("specialEducationSettingDescriptor", StringType)),
    "evaluationElements" -> s(
      f("id", StringType),
      f("evaluationElementTitle", StringType),
      f("evaluationObjectiveReference", s(
        f("evaluationObjectiveTitle", StringType), f("link", link)))),
    "evaluationRatings" -> s(
      f("id", StringType),
      f("evaluationRatingLevelDescriptor", StringType),
      f("evaluationReference", s(
        f("evaluationTitle", StringType), f("link", link))),
      f("performanceEvaluationRatingReference", s(
        f("personId", StringType), f("evaluationDate", StringType)))))

  /** The reference's full extraction census: all 80 namespace-qualified
    * endpoint paths from helper/endpoint/endpoint.json:1-82 (order kept).
    * Drive [[graft.ingest.EdFiClient.extractAll]] with this for a complete
    * silver pull (each also gets its /deletes twin). */
  val extractionEndpoints: Seq[String] = Seq(
    "ed-fi/academicSubjectDescriptors", "ed-fi/addressTypeDescriptors",
    "tpdm/aidTypeDescriptors", "ed-fi/assessments",
    "ed-fi/assessmentCategoryDescriptors",
    "ed-fi/assessmentReportingMethodDescriptors", "ed-fi/calendarDates",
    "ed-fi/calendars", "ed-fi/cohorts", "ed-fi/cohortTypeDescriptors",
    "ed-fi/cohortYearTypeDescriptors", "ed-fi/courseOfferings",
    "ed-fi/courses", "ed-fi/credentials", "ed-fi/disabilityDescriptors",
    "ed-fi/disabilityDesignationDescriptors", "ed-fi/disciplineActions",
    "ed-fi/disciplineDescriptors", "ed-fi/disciplineIncidents",
    "ed-fi/educationalEnvironmentDescriptors", "ed-fi/educationServiceCenters",
    "ed-fi/feederSchoolAssociations", "ed-fi/grades",
    "ed-fi/gradeLevelDescriptors", "ed-fi/gradingPeriodDescriptors",
    "ed-fi/gradingPeriods", "ed-fi/languageDescriptors",
    "ed-fi/languageUseDescriptors", "ed-fi/localEducationAgencies",
    "ed-fi/objectiveAssessments", "ed-fi/parents", "ed-fi/people",
    "ed-fi/performanceLevelDescriptors", "ed-fi/programs",
    "ed-fi/programTypeDescriptors", "ed-fi/raceDescriptors",
    "ed-fi/resultDatatypeTypeDescriptors", "ed-fi/schools",
    "ed-fi/schoolFoodServiceProgramServiceDescriptors",
    "ed-fi/schoolTypeDescriptors", "ed-fi/schoolYearTypes", "ed-fi/sections",
    "ed-fi/sessions", "ed-fi/sexDescriptors",
    "ed-fi/staffDisciplineIncidentAssociations",
    "ed-fi/staffEducationOrganizationAssignmentAssociations", "ed-fi/staffs",
    "ed-fi/staffSchoolAssociations", "ed-fi/staffSectionAssociations",
    "ed-fi/stateAbbreviationDescriptors", "ed-fi/stateEducationAgencies",
    "ed-fi/studentAssessments", "ed-fi/studentCharacteristicDescriptors",
    "ed-fi/studentCohortAssociations",
    "ed-fi/studentDisciplineIncidentBehaviorAssociations",
    "ed-fi/studentEducationOrganizationAssociations",
    "ed-fi/studentLanguageInstructionProgramAssociations",
    "ed-fi/studentParentAssociations", "ed-fi/studentProgramAssociations",
    "ed-fi/students", "ed-fi/studentSchoolAssociations",
    "ed-fi/studentSchoolAttendanceEvents",
    "ed-fi/studentSchoolFoodServiceProgramAssociations",
    "ed-fi/studentSectionAssociations", "ed-fi/studentSectionAttendanceEvents",
    "ed-fi/studentSpecialEducationProgramAssociations",
    "ed-fi/surveyQuestionResponses", "ed-fi/surveyQuestions",
    "ed-fi/surveyResponses", "ed-fi/surveys", "ed-fi/termDescriptors",
    "ed-fi/tribalAffiliationDescriptors", "tpdm/candidates",
    "tpdm/candidateEducatorPreparationProgramAssociations",
    "tpdm/evaluationElements", "tpdm/evaluationElementRatings",
    "tpdm/evaluationObjectives", "tpdm/evaluationRatings",
    "tpdm/financialAids", "tpdm/surveyResponsePersonTargetAssociations")

  private def descriptorSchema(idField: String): StructType = s(
    f(idField, LongType), f("codeValue", StringType),
    f("description", StringType), f("namespace", StringType),
    f("shortDescription", StringType))

  /** The `/deletes` twin feed shape, shared by every endpoint
    * (reference api/api.py:133-136 extracts it; the Ed-Fi change-query
    * contract returns the removed resource's id and the change version
    * of the deletion). The reference never CONSUMES this feed; here
    * [[graft.ops.Snapshot.applyDeletes]] folds it into gold. */
  val DeletesSchema: StructType = s(
    f("id", StringType), f("changeVersion", LongType))

  def schema(endpoint: String): StructType =
    schemas.getOrElse(endpoint, extractionOnlySchemas.getOrElse(endpoint,
      if (endpoint.endsWith("_deletes")) DeletesSchema
      else throw new IllegalArgumentException(s"unknown endpoint: $endpoint")))
}
