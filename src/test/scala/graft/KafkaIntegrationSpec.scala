package graft

import graft.model._
import graft.sources.JsonRecords
import graft.streaming.QueryRunner
import org.apache.spark.sql.DataFrame

/**
 * Live-broker Kafka integration recipe, compiled but IGNORED in this
 * sandbox (no broker, and `spark-sql-kafka-0-10` is not on the
 * classpath — `.format("kafka")` resolves the connector at RUNTIME via
 * DataSource lookup, so everything below type-checks today and runs
 * unmodified once the two jars land).
 *
 * To run for real (reference analog: DSLSpout.java:45-55, the
 * bullet-dsl Kafka connector):
 *
 *  1. Add the connector to the session classpath (NOT to build.sbt in
 *     this sandbox — zero egress):
 *       spark-sql-kafka-0-10_2.13-<spark version>.jar
 *       kafka-clients-3.x.jar
 *     e.g. `spark-submit --packages
 *       org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2`.
 *
 *  2. Stand up a broker. Testcontainers recipe (sbt):
 *       libraryDependencies += "com.dimafeng" %% "testcontainers-scala-kafka" % "0.41.x" % Test
 *     then:
 *       val kafka = KafkaContainer(DockerImageName.parse("confluentinc/cp-kafka:7.6.0"))
 *       kafka.start()                      // container per suite
 *       val bootstrap = kafka.bootstrapServers
 *     and produce fixture JSON with a plain KafkaProducer in @BeforeAll.
 *
 *  3. Flip `ignore` → `test` below.
 *
 * What the recipe pins that the Kafka-SHAPED e2e (QueryRunnerSpec
 * "kafka-shaped stream: checkpoint restart resumes...") cannot: real
 * offset tracking (startingOffsets/failOnDataLoss), broker partition →
 * Spark partition mapping, and maxOffsetsPerTrigger batch sizing.
 */
class KafkaIntegrationSpec extends SparkTestBase {

  /** The exact stream a production deployment builds: broker frames →
    * JSON value decode → runner. Compiled against the real option
    * surface; used by the ignored test below. */
  private def kafkaStream(bootstrap: String, topic: String): DataFrame = {
    val frames = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      // earliest: the test produces BEFORE the stream starts; a live
      // deployment uses "latest" — queries are forward-looking
      .option("startingOffsets", "earliest")
      // bound micro-batch size so one huge backlog can't blow the first
      // trigger's memory — the knob that replaces the reference's spout
      // max.spout.pending at-the-source backpressure
      .option("maxOffsetsPerTrigger", "10000")
      // a deleted/compacted-away offset range should fail loudly in
      // tests; production monitoring may prefer "false" + an alert
      .option("failOnDataLoss", "true")
      .load()
    JsonRecords.fromKafka(frames, "user string, event_type string, value long")
      .select("record.*", "topic", "partition", "offset")
  }

  ignore("kafka broker e2e: forward-looking count over live topic frames") {
    val bootstrap = sys.env.getOrElse("KAFKA_BOOTSTRAP", "localhost:9092")
    val stream = kafkaStream(bootstrap, "graft_events")
    val runner = new QueryRunner(spark)
    runner.register(QuerySpec("kafka_live",
      filter = Some(Binary(Field("event_type"), Lit("click"), BinOp.EQUALS)),
      aggregation = GroupAll(Seq(GroupOp(GroupOpType.COUNT, None, "cnt"))),
      durationMs = 60000L))
    val sq = runner.runStream(stream, triggerMs = 500, tickIntervalMs = 250)
    try {
      // the producer (suite setup) has written 3 click + 2 view rows
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !runner.queryStats("kafka_live").exists(_("records_seen") >= 3L))
        Thread.sleep(200)
      assert(runner.queryStats("kafka_live").exists(_("records_seen") == 3L))
    } finally sq.stop()
  }
}
