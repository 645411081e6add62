package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck property suites for the warehouse-maintenance kernels
  * (SURVEY.md §5): SCD2 single-active/growth invariants, SCD3 idempotence,
  * and dedup-upsert (M1) idempotence, over generated change batches. */
object ScdProperties extends Properties("scd-kernels") {

  // Spark jobs per case are small but not free; 15 cases per property
  // keeps the suite under a minute while still exploring the space.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** One row per key: (key, value) batches over a small key space so
    * overlap with the existing state is common. */
  private val batchGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(1L, 20L), Gen.identifier.map(_.take(8))))
      .map(_.toMap.toList) // unique keys, last-wins

  private def existing2: DataFrame = Seq(
    (1L, "a", "2019-01-01", "2020-01-01", false),
    (1L, "b", "2020-01-01", "2099-12-31", true),
    (2L, "c", "2020-01-01", "2099-12-31", true),
    (5L, "d", "2020-01-01", "2099-12-31", true),
    (9L, "e", "2020-01-01", "2099-12-31", true)
  ).toDF("k", "v", "start_date", "end_date", "active")
    .withColumn("start_date", col("start_date").cast("date"))
    .withColumn("end_date", col("end_date").cast("date"))

  property("scd2: at most one active row per key, incoming keys exactly one") =
    forAll(batchGen) { batch =>
      val out = Scd.scd2Apply(existing2, batch.toDF("k", "v"), "k", "2020-06-15")
      val counts = out.filter(col("active")).groupBy("k").count().collect()
      val atMostOne = counts.forall(_.getLong(1) == 1L)
      val incomingActive = out.filter(col("active"))
        .select("k").as[Long].collect().toSet
      atMostOne && batch.map(_._1).toSet.subsetOf(incomingActive)
    }

  property("scd2: row count grows by exactly the batch size") =
    forAll(batchGen) { batch =>
      val out = Scd.scd2Apply(existing2, batch.toDF("k", "v"), "k", "2020-06-15")
      out.count() == existing2.count() + batch.size
    }

  property("scd2: keys outside the batch are untouched") =
    forAll(batchGen) { batch =>
      val keys = batch.map(_._1).toSet
      val out = Scd.scd2Apply(existing2, batch.toDF("k", "v"), "k", "2020-06-15")
      val untouchedKeys = existing2.select("k").as[Long].collect().toSet -- keys
      untouchedKeys.forall { k =>
        out.filter(col("k") === k).collect().toSet ==
          existing2.filter(col("k") === k).collect().toSet
      }
    }

  /** Batches with intra-key duplicates: keys repeat up to 3× with
    * DISTINCT payloads and an explicit batch line number `seq` — the
    * per-row-trigger shape SURVEY §7.3 calls out (the reference trigger
    * fires once per inserted row, so every version lands and only the
    * last stays active). */
  private val dupBatchGen: Gen[List[(Long, String, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 8L), Gen.choose(1, 3)))
      .map(_.toMap.toList.flatMap { case (k, reps) =>
        (1 to reps).map(i => (k, s"v$k-$i", i))
      })
      // global, unique line numbers — a real batch's physical order
      .map(_.zipWithIndex.map { case ((k, v, _), i) => (k, v, i + 1) })

  property("scd2 seq: duplicated keys leave one active row (last writer) and a closed chain") =
    forAll(dupBatchGen) { batch =>
      val out = Scd.scd2ApplySeq(existing2, batch.toDF("k", "v", "seq"),
        "k", "seq", "2020-06-15").cache()
      val lastByKey = batch.groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._3)._2
      }
      // exactly one active row per incoming key, carrying the last payload
      val active = out.filter(col("active"))
        .filter(col("k").isInCollection(lastByKey.keys.toSeq))
        .select("k", "v").as[(Long, String)].collect()
      val lastWins = active.length == lastByKey.size &&
        active.forall { case (k, v) => lastByKey(k) == v }
      // every non-final intra-batch version is present but born closed
      val chain = batch.filterNot { case (k, v, _) => lastByKey(k) == v }
        .forall { case (k, v, _) =>
          out.filter(col("k") === k && col("v") === v &&
              !col("active") &&
              col("start_date") === lit("2020-06-15").cast("date") &&
              col("end_date") === lit("2020-06-15").cast("date"))
            .count() == 1L
        }
      // pre-existing versions of hit keys are closed out at asOf
      val hit = lastByKey.keySet
      val existingClosed = out
        .join(existing2.select("k", "v", "start_date"), Seq("k", "v", "start_date"))
        .filter(col("k").isInCollection(hit.toSeq))
        .collect().forall(r => !r.getAs[Boolean]("active"))
      val grows = out.count() == existing2.count() + batch.size
      lastWins && chain && existingClosed && grows
    }

  private def existing3: DataFrame = Seq(
    (1L, "consented", "", "2020-01-01"),
    (2L, "declined", "", "2020-01-01"),
    (5L, "none", "", "2020-01-01")
  ).toDF("k", "consent", "consent_old", "effective_date")
    .withColumn("effective_date", col("effective_date").cast("date"))

  property("scd3: same batch twice == once (idempotence)") =
    forAll(batchGen) { batch =>
      val b = batch.toDF("k", "consent")
      val once = Scd.scd3Apply(existing3, b, "k", "consent", "2020-06-15")
      val twice = Scd.scd3Apply(once, b, "k", "consent", "2020-09-01")
      def norm(df: DataFrame) =
        df.select("k", "consent", "consent_old", "effective_date")
          .collect().map(_.toString).sorted.toSeq
      norm(once) == norm(twice)
    }

  property("scd3: key set is union of existing and batch keys") =
    forAll(batchGen) { batch =>
      val out = Scd.scd3Apply(existing3, batch.toDF("k", "consent"), "k",
        "consent", "2020-06-15")
      out.select("k").as[Long].collect().toSet ==
        (Set(1L, 2L, 5L) ++ batch.map(_._1))
    }

  /** M1 dedup-upsert: union + dropDuplicates on the natural key. */
  private def upsert(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.unionByName(incoming).dropDuplicates("k")

  property("upsert (M1): applying the same batch twice == once") =
    forAll(batchGen) { batch =>
      val b = batch.toDF("k", "v")
      val base = Seq((1L, "x"), (5L, "y")).toDF("k", "v")
      val once = upsert(base, b)
      val twice = upsert(once, b)
      // dropDuplicates keeps an arbitrary row per key, so compare key sets
      // + the invariant that each key appears exactly once
      once.count() == twice.count() &&
        once.select("k").as[Long].collect().sorted.toSeq ==
          twice.select("k").as[Long].collect().sorted.toSeq &&
        once.groupBy("k").count().filter(col("count") > 1).isEmpty
    }
}
