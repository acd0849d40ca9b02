package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Camera QAQC composed path (rca_data_tools/qaqc/visual_data.py:86-194):
  * archive listing → size parse → blank classification → daily wide
  * pivot — the data behind the stacked-bar plot, plus its one-file
  * manifest.
  *
  * Semantics preserved:
  *  - humanfriendly size parse (visual_data.py:26-37): decimal units
  *    (K/M/G = powers of 1000) converted to MiB (/1024²); unparseable
  *    sizes → null;
  *  - CAMHD listings drop mp4/md5 entries (visual_data.py:70-72);
  *  - `image_status`: `possibly_blank` when size_mb < cutoff else
  *    `not_blank` — including the reference's NaN quirk
  *    (visual_data.py:79-81: `np.nan < cutoff` is False, so an entry
  *    whose size failed to parse counts as NOT blank);
  *  - daily wide frame (visual_data.py:108-135): per-day counts pivoted
  *    to (not_blank, possibly_blank), absent days of one status filled
  *    with 0, both columns always present;
  *  - manifest: exactly one artifact, `{site}_{span}_none_full.png`
  *    (visual_data.py:149).
  */
object CameraQaqc {

  final case class Result(data: DataFrame, manifest: Seq[String])

  /** humanfriendly.parse_size-compatible: "2.5M" → 2.5e6 bytes → MiB.
    * Units B/K/KB/M/MB/G/GB, case-insensitive, decimal multipliers. (The
    * other size parser, `TextFunctions.parseHumanSizeMb`, implements
    * q45's synthetic "n.n KB|MB|GB" contract with binary multipliers —
    * THIS one is the faithful port of the camera path's humanfriendly
    * call, visual_data.py:26-37; each scaladoc points at the other.)
    */
  def sizeMb(s: Column): Column = {
    val num = regexp_extract(s, "^([0-9]+\\.?[0-9]*)", 1)
    val numD = when(num =!= "", num.cast("double"))
    // uppercase BEFORE extraction — the pattern itself is case-sensitive.
    // Extract ALL trailing letters, then map only the known units: a
    // partial-suffix pattern like [KMGB]+$ would grab the final "B" of
    // "GIB"/"TB" and misparse a full-size file as a few bytes
    val unit = regexp_extract(upper(s), "([A-Z]+)\\s*$", 1)
    val bytes = when(unit === "B", numD)
      .when(unit === "K" || unit === "KB", numD * 1e3)
      .when(unit === "M" || unit === "MB", numD * 1e6)
      .when(unit === "G" || unit === "GB", numD * 1e9)
      .when(unit === "T" || unit === "TB", numD * 1e12)
      .when(unit === "KIB", numD * 1024.0)
      .when(unit === "MIB", numD * 1024.0 * 1024)
      .when(unit === "GIB", numD * 1024.0 * 1024 * 1024)
      .when(unit === "TIB", numD * 1024.0 * 1024 * 1024 * 1024)
    // unknown units fall through to null → "not_blank" via the NaN quirk
    bytes / (1024.0 * 1024.0)
  }

  /** Listing (img_name, size, date_taken) → classified rows. */
  def classify(listing: DataFrame, cutoffMb: Double, isCamhd: Boolean): DataFrame = {
    val base =
      if (isCamhd)
        listing.filter(!col("img_name").contains("mp4") && !col("img_name").contains("md5"))
      else listing
    base
      .withColumn("size_mb", sizeMb(col("size")))
      // null size_mb < cutoff is null -> otherwise branch: not_blank,
      // bit-faithful to the reference's NaN comparison
      .withColumn("image_status",
        when(col("size_mb") < lit(cutoffMb), "possibly_blank").otherwise("not_blank"))
  }

  /** Daily wide pivot with both status columns guaranteed. */
  def dailyWide(classified: DataFrame): DataFrame =
    classified.groupBy(col("date_taken"))
      .agg(
        sum(when(col("image_status") === "not_blank", 1).otherwise(0))
          .cast("long").as("not_blank"),
        sum(when(col("image_status") === "possibly_blank", 1).otherwise(0))
          .cast("long").as("possibly_blank"))

  def run(listing: DataFrame, cutoffMb: Double, isCamhd: Boolean,
          site: String, spanString: String): Result = {
    val wide = dailyWide(classify(listing, cutoffMb, isCamhd))
    Result(wide, Seq(s"${site}_${spanString}_none_full.png"))
  }
}
