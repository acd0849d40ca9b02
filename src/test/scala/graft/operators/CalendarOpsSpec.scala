package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CalendarOpsSpec extends SparkSpec {
  import spark.implicits._

  test("isoYear assigns year-boundary days to the ISO year of their week") {
    val df = Seq(
      "2024-01-01", // Monday, ISO week 1 of 2024
      "2023-01-01", // Sunday, ISO week 52 of 2022
      "2021-01-01", // Friday, ISO week 53 of 2020
      "2024-12-30"  // Monday, ISO week 1 of 2025
    ).toDF("d").withColumn("t", col("d").cast("timestamp"))
    val out = df.select(CalendarOps.isoYear(col("t"))).as[Int].collect()
    out shouldBe Array(2024, 2022, 2020, 2025)
  }

  test("isoWeekKey matches weekofyear for the same rows") {
    val df = Seq("2023-01-01", "2024-06-15").toDF("d")
      .withColumn("t", col("d").cast("timestamp"))
    val out = df.select(CalendarOps.isoWeekKey(col("t")).as("k"))
      .select("k.iso_year", "k.iso_week").as[(Int, Int)].collect()
    out(0) shouldBe ((2022, 52))
    out(1) shouldBe ((2024, 24))
  }

  test("calendarKey truncates at day/week/month and rejects junk") {
    val df = Seq("2024-06-15 13:45:00").toDF("d")
      .withColumn("t", col("d").cast("timestamp"))
    df.select(CalendarOps.calendarKey(col("t"), "month").cast("date").cast("string"))
      .as[String].collect()(0) shouldBe "2024-06-01"
    an[IllegalArgumentException] should be thrownBy
      CalendarOps.calendarKey(col("t"), "hour")
  }

  test("yearOverYear shifts prior years forward by 365-day multiples (leap-naive)") {
    val df = Seq("2022-03-01 00:00:00", "2024-03-01 00:00:00").toDF("d")
      .withColumn("t", col("d").cast("timestamp"))
    val out = CalendarOps.yearOverYear(df, "t", lit("2024-07-01").cast("timestamp"))
      .orderBy("t")
      .select(col("year_diff"), col("plot_time").cast("string"))
      .as[(Int, String)].collect()
    out(0)._1 shouldBe 2
    out(0)._2 shouldBe "2024-02-29 00:00:00" // 2022-03-01 + 730 days: leap-naive drift
    out(1) shouldBe ((0, "2024-03-01 00:00:00"))
  }
}
