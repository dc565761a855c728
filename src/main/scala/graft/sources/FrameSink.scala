package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kafka-sink stand-in (SURVEY.md §2.1 S8) — no broker in this sandbox, so
  * the sink writes Kafka's OBSERVABLE contract to partitioned text files and
  * the specs assert the contract itself:
  *
  *  - record = key|value frame (the reference's pipe wire format,
  *    `ActivityParser` can re-read it),
  *  - KEYED partitioner: partition = hash(key) mod N — every key's frames
  *    land in exactly ONE partition (Kafka's default partitioner), and
  *  - per-partition ORDER: frames within a partition file are in event-time
  *    order (Kafka preserves append order per partition; a keyed stream
  *    sorted by time before the write reproduces it).
  *
  * The round-robin (unkeyed) variant is `repartition(n)` — its balance
  * property is asserted separately in `QueriesSmokeSpec`.
  *
  * Scale: `repartition(n, key-hash)` + `sortWithinPartitions` is one
  * shuffle + a per-partition sort — the same plan as any keyed windowed
  * write; nothing is collected.
  *
  * With a real broker the swap is one line on each side — sink:
  * `df.selectExpr("CAST(k AS STRING) AS key", "CAST(v AS STRING) AS value")
  *   .writeStream.format("kafka")
  *   .option("kafka.bootstrap.servers", brokers).option("topic", t)` —
  * Kafka's default partitioner then applies the same hash(key)→partition
  * routing this stand-in asserts; source:
  * `spark.readStream.format("kafka").option("subscribe", t)` feeding
  * `ActivityParser.fromTagged` replaces the file-stream dirs. Everything
  * downstream (watermarks, state, sinks) is unchanged.
  */
object FrameSink {

  /** Deterministic keyed partition id: `pmod(xxhash64(key), n)`. */
  def partitionOf(key: Column, n: Int): Column = pmod(xxhash64(key), lit(n))

  /** Frame `df` as key|value records, route each key to its partition, sort
    * each partition by `orderCol`, and write one text dir per partition
    * (`part=<k>/`). Returns the framed DataFrame (lazily reusable). */
  def writeKeyed(df: DataFrame, key: Column, value: Column, orderCol: Column,
                 n: Int, outDir: String): Unit = {
    // partition from the RAW key (xxhash64 of a long and of its string
    // rendering differ); the string cast happens after routing
    df.select(key.as("rawk"), value.cast("string").as("v"), orderCol.as("o"))
      .withColumn("part", partitionOf(col("rawk"), n))
      .withColumn("k", col("rawk").cast("string"))
      .repartition(n, col("part"))
      .sortWithinPartitions(col("part"), col("o"), col("k"))
      .select(concat_ws("|", col("k"), col("v")).as("value"), col("part"))
      .write.mode("overwrite").partitionBy("part").text(outDir)
  }
}
