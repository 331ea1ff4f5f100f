package graft

import java.sql.Timestamp
import graft.queries.{Joins, TimeSeries}
import org.apache.spark.sql.functions._

/** Randomized cross-checks of the hardest formulations against brute-force
  * references computed in plain Scala — independent of any Spark window /
  * session machinery, so a disagreement means the formulation is wrong,
  * not the fixture. Timestamps are drawn on a 1-second grid around the
  * 30-minute gap so exact ties occur often. */
class RandomizedSemanticsSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** Seeded generator: offsets cluster on the 30-minute grid with ±1s
    * jitter so exact boundary ties occur in most samples. */
  private def genEvents(rnd: scala.util.Random): List[(Long, Long, Long)] = {
    val n = 1 + rnd.nextInt(40)
    List.tabulate(n) { i =>
      val user = 1L + rnd.nextInt(3)
      val slot = rnd.nextInt(9).toLong
      val jitter = Seq(-1L, 0L, 0L, 1L, 900L)(rnd.nextInt(5))
      (i.toLong, user, (slot * 1800L + jitter) max 0L)
    }
  }

  private def toDf(rows: List[(Long, Long, Long)], eventType: Long => String) = {
    import spark.implicits._
    rows.map { case (id, u, off) =>
      (id, new Timestamp(base + off * 1000L), u, eventType(id), 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  /** Brute-force sessionization: sort per user, break when gap > 30min. */
  private def refSessions(rows: List[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] =
    rows.groupBy(_._2).iterator.flatMap { case (user, rs) =>
      val times = rs.map(_._3).sorted
      val sessions = scala.collection.mutable.ListBuffer[List[Long]]()
      times.foreach { t =>
        if (sessions.nonEmpty && t - sessions.last.last <= 1800L)
          sessions(sessions.length - 1) = sessions.last :+ t
        else sessions += List(t)
      }
      sessions.map(s => (user, s.head, s.last, s.length.toLong))
    }.toSet

  test("sessionize agrees with a brute-force reference on randomized tie-heavy data") {
    val rnd = new scala.util.Random(42)
    (1 to 15).foreach { trial =>
      val rows = genEvents(rnd)
      val got = TimeSeries.sessionize(toDf(rows, _ => "click")).collect()
        .map { r =>
          (r.getAs[Long]("user_id"),
            (r.getAs[java.time.LocalDateTime]("session_start")
              .toEpochSecond(java.time.ZoneOffset.UTC) * 1000L - base) / 1000L,
            (r.getAs[java.time.LocalDateTime]("session_end")
              .toEpochSecond(java.time.ZoneOffset.UTC) * 1000L - base) / 1000L,
            r.getAs[Long]("n_events"))
        }.toSet
      assert(got == refSessions(rows), s"trial $trial rows=$rows")
    }
  }

  /** Brute-force as-of: latest signup ts <= event ts for the same user. */
  test("asofLastSignup agrees with a brute-force reference (inclusive boundary)") {
    val rnd = new scala.util.Random(7)
    (1 to 15).foreach { trial =>
      val rows = genEvents(rnd)
      val isSignup: Long => String = id => if (id % 3 == 0) "signup" else "click"
      val signupsByUser = rows.filter(r => isSignup(r._1) == "signup")
        .groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
      val expected = rows.map { case (id, u, off) =>
        id -> signupsByUser.getOrElse(u, Nil).filter(_ <= off).lastOption
      }.toMap
      val got = Joins.asofLastSignup(toDf(rows, isSignup)).collect().map { r =>
        r.getAs[Long]("event_id") ->
          Option(r.getAs[java.time.LocalDateTime]("last_signup_ts"))
            .map(t => (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000L - base) / 1000L)
      }.toMap
      assert(got == expected, s"trial $trial rows=$rows")
    }
  }
}
