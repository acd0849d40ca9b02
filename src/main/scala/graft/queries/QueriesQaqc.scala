package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CameraQaqc, HitlNotes}
import graft.sources.Tables

/** Composed QAQC paths: the camera blank-classification daily pivot
  * (visual_data.py:86-194) and the HITL notes taxonomy fan-out
  * (notes.py:66-173), both on listings synthesized deterministically from
  * the parquet tables so DuckDB replays them (the HTML/sheet snapshot
  * loaders are exercised by ProvidersSpec).
  */
object QueriesQaqc {

  type Q = (SparkSession, String) => DataFrame

  /** Synthetic camera listing: size "x.yM" strings with every 17th entry
    * unparseable, spread over 30 days.
    */
  private def listing(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      date_add(lit("2024-01-01").cast("date"),
        (col("o_orderkey") % 30).cast("int")).as("date_taken"),
      concat(lit("CAMDS_img_"), col("o_orderkey"), lit(".jpg")).as("img_name"),
      when(col("o_orderkey") % 17 === 0, lit("N/A"))
        .otherwise(concat(col("o_orderkey") % 30, lit("."),
          col("o_orderkey") % 10, lit("M"))).as("size"))

  /** Synthetic HITL notes: labels carrying site/node/instrument codes. */
  private def notes(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(
      concat(
        element_at(array(lit("RS01SBPS"), lit("RS03AXPS"), lit("CE04OSBP"), lit("RS03ASHS")),
          (col("s_suppkey") % 4 + 1).cast("int")),
        lit("-"),
        element_at(array(lit("SF01A"), lit("BP01"), lit("DP01A")),
          (col("s_suppkey") % 3 + 1).cast("int")),
        lit("-"),
        element_at(array(lit("CTD"), lit("ADCP"), lit("OPTAA"), lit("CAMDS"),
          lit("NUTNR"), lit("ZPLSC")), (col("s_suppkey") % 6 + 1).cast("int")),
        lit("-"), col("s_suppkey")).as("label"),
      element_at(array(lit("Watchlist: drift"), lit("OK nominal"),
        lit("Failed - data gap"), lit("pending review"), lit("Plotting queued")),
        (col("s_suppkey") % 5 + 1).cast("int")).as("note"))

  val queries: Map[String, Q] = Map(
    // S8+C13+A1 composed: camera listing -> size classify -> daily pivot
    "q63_camera_qaqc" -> ((s, d) =>
      CameraQaqc.run(listing(s, d), cutoffMb = 15.0, isCamhd = false,
        site = "RS01SBPS-CAMDS", spanString = "week").data),

    // HITL taxonomy fan-out: page tables + status tables
    "q64_hitl_notes" -> ((s, d) => HitlNotes.taxonomy(notes(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q63_camera_qaqc" -> """
      WITH listing AS (
        SELECT DATE '2024-01-01' + CAST(o_orderkey % 30 AS INT) AS date_taken,
               CASE WHEN o_orderkey % 17 = 0 THEN 'N/A'
                    ELSE CAST(o_orderkey % 30 AS VARCHAR) || '.' ||
                         CAST(o_orderkey % 10 AS VARCHAR) || 'M' END AS size
        FROM orders),
      sized AS (
        SELECT date_taken,
               CASE WHEN regexp_extract(size, '^([0-9]+\.?[0-9]*)', 1) = '' THEN NULL
                    ELSE (CAST(regexp_extract(size, '^([0-9]+\.?[0-9]*)', 1) AS DOUBLE)
                          * 1000000.0) / (1024.0 * 1024.0) END AS size_mb
        FROM listing),
      st AS (
        SELECT date_taken,
               CASE WHEN size_mb < 15.0 THEN 'possibly_blank'
                    ELSE 'not_blank' END AS image_status
        FROM sized)
      SELECT date_taken,
             CAST(sum(CASE WHEN image_status = 'not_blank' THEN 1 ELSE 0 END) AS BIGINT)
               AS not_blank,
             CAST(sum(CASE WHEN image_status = 'possibly_blank' THEN 1 ELSE 0 END) AS BIGINT)
               AS possibly_blank
      FROM st GROUP BY 1""",
    "q64_hitl_notes" -> """
      WITH notes AS (
        SELECT (['RS01SBPS','RS03AXPS','CE04OSBP','RS03ASHS'])[CAST(s_suppkey % 4 AS INT) + 1]
               || '-' ||
               (['SF01A','BP01','DP01A'])[CAST(s_suppkey % 3 AS INT) + 1]
               || '-' ||
               (['CTD','ADCP','OPTAA','CAMDS','NUTNR','ZPLSC'])[CAST(s_suppkey % 6 AS INT) + 1]
               || '-' || CAST(s_suppkey AS VARCHAR) AS label,
               (['Watchlist: drift','OK nominal','Failed - data gap',
                 'pending review','Plotting queued'])[CAST(s_suppkey % 5 AS INT) + 1] AS note
        FROM supplier),
      spec(page, item, patterns) AS (VALUES
        ('Stage1','ADCP',['ADCP']), ('Stage1','BOTPT',['BOTPT']), ('Stage1','CTD',['CTD']),
        ('Stage1','DOFSTA',['DOFSTA']), ('Stage1','DOSTA',['DOSTA']), ('Stage1','FLCDR',['FLCDR']),
        ('Stage1','FLORT',['FLORT']), ('Stage1','FLNTU',['FLNTU']), ('Stage1','FLOR',['FLOR']),
        ('Stage1','NUTNR',['NUTNR']), ('Stage1','PARAD',['PARAD']), ('Stage1','PHSEN',['PHSEN']),
        ('Stage1','PCO2W',['PCO2W']), ('Stage1','SPKIR',['SPKIR']), ('Stage1','VELPT',['VELPT']),
        ('Stage2','CAMHD',['CAMHD']), ('Stage2','OPTAA',['OPTAA']), ('Stage2','PREST',['PREST']),
        ('Stage2','THSPH',['THSPH']), ('Stage2','TMPSF',['TMPSF']), ('Stage2','TRHPH',['TRHPH']),
        ('Stage2','VEL3D',['VEL3D']), ('Stage2','ZPLSC',['ZPLSC']),
        ('Stage3','CAMDS',['CAMDS']), ('Stage3','HPIES',['HPIES']), ('Stage3','HYDBB',['HYDBB']),
        ('Stage3','HYDLF',['HYDLF']), ('Stage3','MASSP',['MASSP']), ('Stage3','OBSBB',['OBSBB']),
        ('Stage3','OBSSP',['OBSSP']),
        ('Stage4','FLOBNC',['FLOBNC']), ('Stage4','FLOBNM',['FLOBNM']), ('Stage4','OSMOIA',['OSMOIA']),
        ('Stage4','PPS',['PPS']), ('Stage4','RAS',['RAS']), ('Stage4','D1000',['D1000']),
        ('Sites','CEO2SHBP',['CEO2SHBP']), ('Sites','CE04OSBP',['CE04OSBP']),
        ('Sites','CE04OSPD',['CE04OSPD']), ('Sites','CE04OSPS',['CE04OSPS']),
        ('Sites','RS01SBPD',['RS01SBPD']), ('Sites','RS01SBPS',['RS01SBPS']),
        ('Sites','RS01SLBS',['RS01SLBS']), ('Sites','RS01SUM1',['RS01SUM1']),
        ('Sites','RS01SUM2',['RS01SUM2']), ('Sites','RS03AXBS',['RS03AXBS']),
        ('Sites','RS03AXPD',['RS03AXPD']), ('Sites','RS03AXPS',['RS03AXPS']),
        ('Sites','RS03INT1',['RS03INT1']), ('Sites','RS03INT2',['RS03INT2']),
        ('Sites','RS03CCAL',['RS03CCAL']), ('Sites','RS03ECAL',['RS03ECAL']),
        ('Sites','RS03ASHS',['RS03ASHS']),
        ('Platforms','BEP',['BP']), ('Platforms','Deep-Profiler',['DP0']),
        ('Platforms','Shallow-Profiler',['SF0']),
        ('Platforms','Shallow-Profiler-200m_Platform',['PC0']),
        ('Platforms','Seafloor',['SLBS','SUM1','SUM2','AXBS','INT1','INT2','CCAL','ECAL','ASHS'])),
      bypage AS (
        SELECT s.page, s.item, n.label, n.note
        FROM notes n JOIN spec s
          ON len(list_filter(s.patterns, p -> contains(n.label, p))) > 0),
      bystatus AS (
        SELECT 'Status' AS page, s.item, n.label, n.note
        FROM notes n
        JOIN (SELECT unnest(['Watchlist','Failed','Harvest','Plotting','Pending']) AS item) s
          ON contains(lower(n.note), lower(s.item)))
      SELECT page, item, label, note FROM bypage
      UNION ALL
      SELECT page, item, label, note FROM bystatus"""
  )
}
