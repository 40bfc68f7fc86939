package graft.core

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.types._

/** Data contracts: declared table schemas with required fields, numeric
  * bounds, and default expressions — the Spark-native analog of the
  * reference's Pydantic models (reference: logging-service/app/contracts.py:
  * 9-58, dataops/app/contracts.py:4-13, join-service/app/main.py:130-136).
  *
  * A contract drives four things:
  *   - the `from_json` parse schema of the bronze log (Etl),
  *   - required-field / type validation predicates (Validation),
  *   - numeric bounds validation (Validation, bounds typically produced by
  *     profiling — Profile.toBounds, mirroring dataops/app/profile.py:21-39),
  *   - the flattened silver column list (Flatten.columnPaths + Migrate).
  */
final case class FieldBounds(min: Option[Double], max: Option[Double])

final case class Contract(
    table: String,
    schema: StructType,
    required: Seq[String],
    bounds: Map[String, FieldBounds] = Map.empty,
    defaults: Map[String, Column] = Map.empty) {

  def columnPaths: Seq[String] = graft.etl.Flatten.columnPaths(schema)
}

// ---- Reference event shapes (logging-service/app/contracts.py:34-58) ----

final case class UserRef(id: Long)
final case class SearchResult(document_id: Long, position: Long, score: Double)
final case class SearchEvent(
    timestamp_micros: Option[Long],
    user: UserRef,
    query_id: String,
    raw_query: String,
    results: Option[Seq[SearchResult]])
final case class ClickEvent(
    timestamp_micros: Option[Long],
    query_id: String,
    document_id: Long)

// ---- Reference stream shapes (join-service/app/main.py:29-50,130-136) ----

final case class Decision(key: String, context: String, action: String,
    probability: Double, insert_ms: Long)
final case class Reward(key: String, reward: Double, insert_ms: Long)
final case class JoinedDecision(key: String, context: String, action: String,
    probability: Double, reward: Double, decision_insert_ms: Long,
    reward_delta_ms: Option[Long])

// ---- Reference dataops shape (dataops/app/contracts.py:4-13) ----

final case class AgrawalRecord(salary: Double, commission: Double, age: Int,
    elevel: Int, car: Int, zipcode: Int, hvalue: Int, hyears: Int, loan: Double)

object Contracts {
  import org.apache.spark.sql.functions._

  def schemaOf[T: Encoder]: StructType =
    implicitly[Encoder[T]].schema

  implicit val searchEventEnc: Encoder[SearchEvent] = Encoders.product[SearchEvent]
  implicit val clickEventEnc: Encoder[ClickEvent] = Encoders.product[ClickEvent]
  implicit val decisionEnc: Encoder[Decision] = Encoders.product[Decision]
  implicit val rewardEnc: Encoder[Reward] = Encoders.product[Reward]
  implicit val joinedDecisionEnc: Encoder[JoinedDecision] = Encoders.product[JoinedDecision]
  implicit val agrawalEnc: Encoder[AgrawalRecord] = Encoders.product[AgrawalRecord]

  /** `searches` contract (reference: contracts.py:34-48; required set from
    * config/openapi.json:181-185; timestamp default contracts.py:9-12).
    */
  val searches: Contract = Contract(
    table = "searches",
    schema = schemaOf[SearchEvent],
    required = Seq("user", "query_id", "raw_query"),
    defaults = Map("timestamp_micros" -> unix_micros(current_timestamp())))

  /** `clicks` contract (reference: contracts.py:51-58, openapi.json:158-161). */
  val clicks: Contract = Contract(
    table = "clicks",
    schema = schemaOf[ClickEvent],
    required = Seq("query_id", "document_id"),
    defaults = Map("timestamp_micros" -> unix_micros(current_timestamp())))

  /** `decisions` contract; probability ∈ [0,1] (main.py:134-136). */
  val decisions: Contract = Contract(
    table = "decisions",
    schema = schemaOf[Decision],
    required = Seq("key", "context", "action", "probability"),
    bounds = Map("probability" -> FieldBounds(Some(0.0), Some(1.0))))

  val rewards: Contract = Contract(
    table = "rewards",
    schema = schemaOf[Reward],
    required = Seq("key", "reward"))

  val agrawal: Contract = Contract(
    table = "agrawal",
    schema = schemaOf[AgrawalRecord],
    required = Seq("salary", "commission", "age", "elevel", "car", "zipcode",
      "hvalue", "hyears", "loan"))
}
