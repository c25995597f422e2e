package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** JSON-LD entity ingestion — the columnar replay of the reference's
  * JSON-LD → pydantic conversion layer (reference `src/core/models.py:
  * 104-266`): the full declarative property map, the `_get_value` value-node
  * extraction (`models.py:171-177`), and the `_get_list` wrap
  * (`models.py:179-182`).
  *
  * Spark-first shape: a JSON-LD node table parses once with `from_json`
  * against a fixed schema whose field names are the property URIs; value
  * extraction and renaming are pure projections (codegen'd, zero shuffle).
  * `_get_list` itself disappears under a fixed schema (a column is either
  * array-typed or not — SURVEY.md §2.2); `wrapList` is provided for the
  * scalar-or-array normalization a permissive ingest schema needs.
  */
object JsonLd {

  /** Full property-URI → model-field map — data parity with the reference's
    * `JSONLD_TO_PYDANTIC_MAPPING` (`models.py:109-170`, all 52 entries:
    * schema.org, SD ontology, Imaging-Plaza, MD4I).
    */
  val jsonldToPydantic: Seq[(String, String)] = Seq(
    // schema.org
    "http://schema.org/name" -> "name",
    "http://schema.org/description" -> "description",
    "http://schema.org/url" -> "url",
    "http://schema.org/identifier" -> "identifier",
    "http://schema.org/dateCreated" -> "dateCreated",
    "http://schema.org/datePublished" -> "datePublished",
    "http://schema.org/license" -> "license",
    "http://schema.org/author" -> "author",
    "http://schema.org/codeRepository" -> "codeRepository",
    "http://schema.org/programmingLanguage" -> "programmingLanguage",
    "http://schema.org/applicationCategory" -> "applicationCategory",
    "http://schema.org/featureList" -> "featureList",
    "http://schema.org/image" -> "image",
    "http://schema.org/isAccessibleForFree" -> "isAccessibleForFree",
    "http://schema.org/isBasedOn" -> "isBasedOn",
    "http://schema.org/operatingSystem" -> "operatingSystem",
    "http://schema.org/softwareRequirements" -> "softwareRequirements",
    "http://schema.org/processorRequirements" -> "processorRequirements",
    "http://schema.org/memoryRequirements" -> "memoryRequirements",
    "http://schema.org/supportingData" -> "supportingData",
    "http://schema.org/conditionsOfAccess" -> "conditionsOfAccess",
    "http://schema.org/citation" -> "citation",
    "http://schema.org/affiliation" -> "affiliation",
    "http://schema.org/legalName" -> "legalName",
    "http://schema.org/encodingFormat" -> "encodingFormat",
    "http://schema.org/defaultValue" -> "defaultValue",
    "http://schema.org/valueRequired" -> "valueRequired",
    "http://schema.org/measurementTechnique" -> "measurementTechnique",
    "http://schema.org/variableMeasured" -> "variableMeasured",
    "http://schema.org/contentUrl" -> "contentUrl",
    "http://schema.org/softwareVersion" -> "softwareVersion",
    // SD ontology
    "https://w3id.org/okn/o/sd#hasDocumentation" -> "hasDocumentation",
    "https://w3id.org/okn/o/sd#hasExecutableInstructions" -> "hasExecutableInstructions",
    "https://w3id.org/okn/o/sd#hasAcknowledgements" -> "hasAcknowledgements",
    "https://w3id.org/okn/o/sd#hasParameter" -> "hasParameter",
    "https://w3id.org/okn/o/sd#readme" -> "readme",
    "https://w3id.org/okn/o/sd#hasFunding" -> "hasFunding",
    "https://w3id.org/okn/o/sd#hasSoftwareImage" -> "hasSoftwareImage",
    "https://w3id.org/okn/o/sd#hasFormat" -> "hasFormat",
    "https://w3id.org/okn/o/sd#hasDimensionality" -> "hasDimensionality",
    "https://w3id.org/okn/o/sd#availableInRegistry" -> "availableInRegistry",
    "https://w3id.org/okn/o/sd#fundingGrant" -> "fundingGrant",
    "https://w3id.org/okn/o/sd#fundingSource" -> "fundingSource",
    // Imaging-Plaza
    "https://imaging-plaza.epfl.ch/ontology#imagingModality" -> "imagingModality",
    "https://imaging-plaza.epfl.ch/ontology#isPluginModuleOf" -> "isPluginModuleOf",
    "https://imaging-plaza.epfl.ch/ontology#relatedToOrganization" -> "relatedToOrganization",
    "https://imaging-plaza.epfl.ch/ontology#requiresGPU" -> "requiresGPU",
    "https://imaging-plaza.epfl.ch/ontology#hasExecutableNotebook" -> "hasExecutableNotebook",
    "https://imaging-plaza.epfl.ch/ontology#fairLevel" -> "fairLevel",
    "https://imaging-plaza.epfl.ch/ontology#graph" -> "graph",
    // MD4I
    "http://w3id.org/nfdi4ing/metadata4ing#orcidId" -> "orcidId",
    "http://w3id.org/nfdi4ing/metadata4ing#hasRorId" -> "hasRorId")

  private val mapping: Map[String, String] = jsonldToPydantic.toMap

  /** Schema of one JSON-LD value node: `{"@value": ..., "@id": ...}`. */
  val valueNodeSchema: StructType = new StructType()
    .add("@value", StringType).add("@id", StringType)

  /** `_get_value` (`models.py:171-177`) over a value-node STRUCT column:
    * `@value`, falling back to `@id`.
    */
  def valueOf(node: Column): Column =
    coalesce(node.getField("@value"), node.getField("@id"))

  /** `_get_value` over an ARRAY of value nodes: the reference recurses into
    * the FIRST element (`models.py:175-176`); an empty list yields null
    * (try_element_at — ANSI mode would throw on index 1 of []).
    */
  def firstValue(nodes: Column): Column =
    valueOf(try_element_at(nodes, lit(1)))

  /** `_get_list` normalization for a nullable array column: absent key →
    * empty list (`models.py:179-182`; the scalar-wrap half disappears under
    * a fixed schema).
    */
  def wrapList(
      c: Column,
      elemType: org.apache.spark.sql.types.DataType = StringType): Column =
    coalesce(c, array().cast(ArrayType(elemType)))

  /** Rename every property-URI column to its model field name — the
    * materialized 52-entry map applied as ONE projection (not 52
    * `withColumnRenamed` plans). Unmapped columns pass through.
    */
  def renameEntity(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      df.col(s"`$c`").as(mapping.getOrElse(c, c))).toIndexedSeq: _*)

  private val reverseMapping: Map[String, String] =
    jsonldToPydantic.map(_.swap).toMap

  /** Reverse projection — model field names back to property URIs, the
    * engine analog of the reference's `json_to_jsonLD` context expansion
    * (`src/utils/utils.py:29-36`).
    */
  def expandEntity(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      df.col(s"`$c`").as(reverseMapping.getOrElse(c, c))).toIndexedSeq: _*)
}
