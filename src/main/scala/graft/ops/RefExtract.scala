package graft.ops

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** F7 — the reference's one genuine scalar UDF: recursive reference
  * extraction from arbitrarily nested JSON documents.
  *
  * Mirrors two reference walkers:
  *  - CFN template scan (`lambda/etl_cfn/neptune_etl_cfn.py:200-242`):
  *    `{"Ref": id}`, `{"Fn::GetAtt": [id, attr]}` (or `"id.attr"` string
  *    form), `{"Fn::Sub": "...${id}..."}` (plain refs only — dotted
  *    attribute refs are skipped, matching the `[^.}]+` regex at
  *    `etl_cfn:214-217`).
  *  - Step Function definition scan (`lambda/etl_aws/neptune_etl_aws.py:
  *    1117-1147`): any `"Resource"` key holding an `arn:` string, with
  *    F8 suffix cleanup (`:sync`/`:async`/trailing `*`/`:` stripped,
  *    `etl_aws:1138,1649`).
  *
  * S24: templates are parsed as JSON first, then YAML (snakeyaml, also on
  * Spark's classpath) — mirroring `etl_cfn:169-183`'s
  * `json.loads`-then-`yaml.safe_load` fallback, including its limits: the
  * reference uses `safe_load`, which rejects CFN short-form tags (`!Ref`),
  * so only long-form YAML templates yield refs, and any unparseable body
  * degrades to the empty list rather than erroring.
  *
  * Returns the sorted distinct reference list; invalid input → empty array.
  * Implemented on Jackson (already on Spark's classpath) as a Scala UDF —
  * per SURVEY.md §2.11 this is the single operator where a UDF beats
  * composing builtins; everything else in the engine stays codegen-friendly.
  */
object RefExtract {
  private val subRef = raw"\$$\{([^.}]+)\}".r

  // one parser per executor thread — ObjectMapper construction is far more
  // expensive than a parse, and the UDF runs once per row
  private val mappers = ThreadLocal.withInitial(() => new ObjectMapper())

  /** JSON first, YAML fallback (S24). Returns null when neither parses. */
  private def parseTree(mapper: ObjectMapper, body: String): JsonNode =
    try mapper.readTree(body)
    catch {
      case _: Exception =>
        try {
          val yaml = new org.yaml.snakeyaml.Yaml(
            new org.yaml.snakeyaml.constructor.SafeConstructor(
              new org.yaml.snakeyaml.LoaderOptions()))
          mapper.valueToTree[JsonNode](yaml.load[Object](body))
        } catch { case _: Exception => null }
    }

  def cleanArn(arn: String): String = {
    var a = arn.trim
    if (a.endsWith(":sync")) a = a.dropRight(5)
    if (a.endsWith(":async")) a = a.dropRight(6)
    a = a.reverse.dropWhile(c => c == '*' || c == ':').reverse
    a
  }

  def extract(json: String): Seq[String] = {
    if (json == null) return Seq.empty
    val root = parseTree(mappers.get(), json)
    if (root == null) return Seq.empty
    val refs = mutable.LinkedHashSet.empty[String]

    def walk(node: JsonNode): Unit = {
      if (node.isObject) {
        node.fields().asScala.foreach { e =>
          val (k, v) = (e.getKey, e.getValue)
          k match {
            case "Ref" if v.isTextual => refs += v.asText()
            case "Fn::GetAtt" if v.isArray && v.size() > 0 =>
              refs += v.get(0).asText()
            case "Fn::GetAtt" if v.isTextual =>
              refs += v.asText().split('.').head
            case "Fn::Sub" if v.isTextual =>
              subRef.findAllMatchIn(v.asText()).foreach(m => refs += m.group(1))
            case "Resource" if v.isTextual && v.asText().startsWith("arn:") =>
              refs += cleanArn(v.asText())
            case _ => walk(v)
          }
        }
      } else if (node.isArray) {
        node.elements().asScala.foreach(walk)
      }
    }
    walk(root)
    refs.toSeq.sorted
  }

  /** The UDF handle for DataFrame use: `refsUdf(col("template_json"))`. */
  val refsUdf: UserDefinedFunction = udf(extract _)
}
