package graft.schema

import org.apache.spark.sql.types._

/**
 * Schema constants for the dCache billing-event pipeline.
 *
 * The input is a stream of JSON strings, each a billing event whose shape
 * depends on its `msgType`. The superset of 29 possible top-level fields is
 * fixed (reference: `Dcache_kafka_to_hive.py:29-36`); fields absent for a
 * given msgType parse to NULL (`Dcache_kafka_to_hive.py:58-61`). Two fields
 * (`status`, `protocolInfo`) are nested JSON objects flattened at parse time
 * (`Dcache_kafka_to_hive.py:75-81`); ten columns get typed casts after
 * extraction (`Dcache_kafka_to_hive.py:86-95`).
 */
object BillingSchema {

  /** The 29 possible top-level fields, in reference order
    * (`Dcache_kafka_to_hive.py:29-36`). */
  val inputFields: Seq[String] = Seq(
    "date", "msgType", "cellName", "session", "subject", "initiator",
    "transferPath", "queuingTime", "cellDomain", "isP2p", "transferTime",
    "storageInfo", "transferSize", "localEndpoint", "protocolInfo",
    "cellType", "fileSize", "pnfsid", "billingPath", "isWrite", "status",
    "owner", "clientChain", "mappedGID", "sessionDuration", "mappedUID",
    "client", "locations", "transaction"
  )

  val partitionField = "partition_date"

  /** Top-level extraction schema: everything as STRING. `status` and
    * `protocolInfo` stay raw JSON text here (Spark's JSON parser returns the
    * raw object text for a StringType field) and are flattened in a second
    * pass — same two-level extraction semantics as the reference's nested
    * `json_tuple` (`Dcache_kafka_to_hive.py:71-81`). */
  val topLevel: StructType =
    StructType(inputFields.map(f => StructField(f, StringType, nullable = true)))

  /** `status` → {msg, code} (`Dcache_kafka_to_hive.py:75-77`). */
  val statusSchema: StructType = StructType(Seq(
    StructField("msg", StringType), StructField("code", StringType)))

  /** `protocolInfo` → {protocol, port, host} (`Dcache_kafka_to_hive.py:78-81`). */
  val protocolInfoSchema: StructType = StructType(Seq(
    StructField("protocol", StringType), StructField("port", StringType),
    StructField("host", StringType)))

  /** Flattened column names appended after the 29 input fields. */
  val flattenedFields: Seq[String] = Seq(
    "status_msg", "status_code",
    "protocolInfo_protocol", "protocolInfo_port", "protocolInfo_host")

  /** Post-extraction typed casts, in reference order
    * (`Dcache_kafka_to_hive.py:86-95`). Applied as try_cast so garbage
    * strings yield NULL (non-ANSI cast parity on Spark 4). */
  val castTargets: Seq[(String, String)] = Seq(
    "isP2p" -> "boolean",
    "transferTime" -> "float",
    "transferSize" -> "float",
    "protocolInfo_port" -> "int",
    "fileSize" -> "float",
    "status_code" -> "int",
    "mappedGID" -> "int",
    "sessionDuration" -> "int",
    "mappedUID" -> "int",
    "queuingTime" -> "int")

  /** Per-table column lists in DDL order (`Dcache_kafka_to_hive.py:116,123,130,137`). */
  val transferCols: Seq[String] = Seq(
    "date", "msgType", "cellName", "session", "subject", "initiator",
    "transferPath", "queuingTime", "cellDomain", "isP2p", "transferTime",
    "storageInfo", "transferSize", "localEndpoint", "protocolInfo_protocol",
    "protocolInfo_port", "protocolInfo_host", "cellType", "fileSize",
    "pnfsid", "billingPath", "isWrite", "status_msg", "status_code")

  val requestCols: Seq[String] = Seq(
    "date", "owner", "msgType", "clientChain", "mappedGID", "cellName",
    "session", "subject", "transferPath", "sessionDuration", "storageInfo",
    "cellType", "fileSize", "mappedUID", "queuingTime", "cellDomain",
    "client", "pnfsid", "billingPath", "status_msg", "status_code")

  val storageCols: Seq[String] = Seq(
    "date", "msgType", "transferTime", "cellName", "session", "storageInfo",
    "cellType", "fileSize", "queuingTime", "cellDomain", "locations",
    "pnfsid", "transaction", "billingPath", "status_msg", "status_code")

  val removeCols: Seq[String] = Seq(
    "date", "owner", "msgType", "clientChain", "mappedGID", "cellName",
    "session", "subject", "transferPath", "sessionDuration", "cellType",
    "fileSize", "mappedUID", "queuingTime", "cellDomain", "client",
    "pnfsid", "billingPath", "transaction", "status_msg", "status_code")

  /** Hive column type per column, for table DDL. Reference DDL uses
    * STRING/INTEGER/BOOLEAN/REAL (`Dcache_kafka_to_hive.py:162-262`).
    * Table-local overrides reproduce the reference's per-table type drift
    * (e.g. `queuingTime` INTEGER in transfer but REAL elsewhere — SURVEY §1.3). */
  private val baseTypes: Map[String, String] = Map(
    "queuingTime" -> "INT", "isP2p" -> "BOOLEAN", "transferTime" -> "FLOAT",
    "transferSize" -> "FLOAT", "fileSize" -> "FLOAT",
    "protocolInfo_port" -> "INT", "status_code" -> "INT",
    "mappedGID" -> "INT", "mappedUID" -> "INT",
    "sessionDuration" -> "FLOAT").withDefaultValue("STRING")

  private val realQueuing = Map("queuingTime" -> "FLOAT")

  /** table name -> (column, hive type) pairs in DDL order. Note the operand
    * order: `baseTypes ++ realQueuing` keeps baseTypes' STRING default (a
    * `Map.WithDefault` concat preserves the left default in 2.13) while the
    * right operand wins for `queuingTime`, reproducing the reference's
    * per-table FLOAT override (`Dcache_kafka_to_hive.py:207,227,253`). */
  val tableSchemas: Map[String, Seq[(String, String)]] = Map(
    "transfer" -> transferCols.map(c => c -> baseTypes(c)),
    "request" -> requestCols.map(c => c -> (baseTypes ++ realQueuing)(c)),
    "storage" -> storageCols.map(c => c -> (baseTypes ++ realQueuing)(c)),
    "remove" -> removeCols.map(c => c -> (baseTypes ++ realQueuing)(c)))

  /** Spark StructType for each target table (without the partition column). */
  def sparkSchema(table: String): StructType = StructType(
    tableSchemas(table).map { case (c, t) =>
      val dt = t match {
        case "INT" => IntegerType
        case "BOOLEAN" => BooleanType
        case "FLOAT" => FloatType
        case _ => StringType
      }
      StructField(c, dt, nullable = true)
    })
}
