package graft.tools

import graft.sources.ConfigRegistry
import graft.sources.ConfigRegistry.{SiteConfig, WorkerSize}

/** CLI orchestration shell — the reference's pipeline front end
  * (rca_data_tools/qaqc/pipeline.py:195-277 `parse_args`/`main`, instance
  * guards at :65-98, launch routing at :148-170, stage fan-out at
  * :173-192) as a pure, testable plan builder plus a thin `main`.
  *
  * Faithful semantics:
  *  - `--site` and `--stage*` are mutually exclusive (pipeline.py:237-239);
  *  - homebrew (staged) QARTOD output refuses to sync to the live
  *    dashboard without an archive `--prefix` (pipeline.py:242-245);
  *  - a prefix folds into the bucket path (pipeline.py:249-250);
  *  - span validity is per site: CAM sites lose the 1-day span, SPKIRA /
  *    OPTAA sites are throttled to short spans UNLESS homebrew mode is on
  *    (pipeline.py:75-84) — an invalid (site, span) yields a SKIPPED
  *    launch, not an error (pipeline.py:141-142);
  *  - unknown sites error with the available list (pipeline.py:68-71);
  *  - per-(site, span) worker routing with the 2vcpu/16gb default
  *    (pipeline.py:148-168), launches staggered (pipeline.py:189-192).
  *
  * The builder emits the launch PLAN; executing a launch is
  * [[graft.Pipeline]] surface and whatever scheduler hosts it.
  */
object QaqcCli {

  final case class CliArgs(
      stage1: Boolean = false, stage2: Boolean = false, stage3: Boolean = false,
      run: Boolean = false, sync: Boolean = false,
      site: Option[String] = None, time: String = "",
      bucket: String = "qaqc-bucket", prefix: String = "",
      span: String = "7", threshold: Int = 5000000,
      homebrewQartod: Boolean = false, express: Boolean = false)

  final case class Launch(name: String, site: String, span: String,
                          stage: Int, worker: WorkerSize, valid: Boolean,
                          staggerSeconds: Int,
                          parameters: Map[String, String])

  def parseArgs(argv: Seq[String], defaultTime: String): Either[String, CliArgs] = {
    def loop(rest: List[String], acc: CliArgs): Either[String, CliArgs] = rest match {
      case Nil => Right(acc)
      case "--stage1" :: t => loop(t, acc.copy(stage1 = true))
      case "--stage2" :: t => loop(t, acc.copy(stage2 = true))
      case "--stage3" :: t => loop(t, acc.copy(stage3 = true))
      case "--run" :: t => loop(t, acc.copy(run = true))
      case "--s3-sync" :: t => loop(t, acc.copy(sync = true))
      case "--homebrew-qartod" :: t => loop(t, acc.copy(homebrewQartod = true))
      case "--express" :: t => loop(t, acc.copy(express = true))
      case "--site" :: v :: t => loop(t, acc.copy(site = Some(v)))
      case "--time" :: v :: t => loop(t, acc.copy(time = v))
      case "--s3-bucket" :: v :: t => loop(t, acc.copy(bucket = v))
      case "--prefix" :: v :: t => loop(t, acc.copy(prefix = v))
      case "--span" :: v :: t => loop(t, acc.copy(span = v))
      case "--threshold" :: v :: t =>
        // keep the Either contract total: a malformed int must surface as
        // Left, not an uncaught NumberFormatException
        v.toIntOption match {
          case Some(n) => loop(t, acc.copy(threshold = n))
          case None => Left(s"--threshold needs an integer, got: $v")
        }
      case other :: _ => Left(s"unknown argument: $other")
    }
    loop(argv.toList, CliArgs(time = defaultTime))
  }

  /** Span validity per SITE NAME (pipeline.py:75-78 checks the site
    * string, not the instrument class; the SPKIRA/OPTAA throttle lifts in
    * homebrew mode).
    */
  def validSpansFor(site: String, homebrewQartod: Boolean): Set[String] =
    if (site.contains("CAM")) ConfigRegistry.CamSpans
    else if ((site.contains("SPKIRA") || site.contains("OPTAA")) && !homebrewQartod)
      ConfigRegistry.HeavySpans
    else ConfigRegistry.AllSpans

  def buildPlan(args: CliArgs,
                sites: Map[String, SiteConfig],
                exceptions: Map[(String, String), WorkerSize] = Map.empty)
      : Either[String, Seq[Launch]] = {
    val anyStage = args.stage1 || args.stage2 || args.stage3
    if (args.site.isDefined && anyStage)
      return Left("Do not use --site and --stage arguments together. " +
        "Run either individual sites OR stage groups of instruments.")
    if (args.homebrewQartod && args.sync && args.prefix.isEmpty)
      return Left("Refusing to sync homebrew (staged) QARTOD plots to the " +
        "live dashboard. Pass --prefix archives/internal/<slug> to target an archive.")
    val bucket =
      if (args.prefix.nonEmpty)
        args.bucket + "/" + args.prefix.stripPrefix("/").stripSuffix("/")
      else args.bucket

    val selectedStages =
      Seq(1 -> args.stage1, 2 -> args.stage2, 3 -> args.stage3)
        .collect { case (s, true) => s }
    val selected: Either[String, Seq[SiteConfig]] = args.site match {
      case Some(s) =>
        sites.get(s).map(Seq(_)).toRight(
          s"$s is not available. Available sites ${sites.keys.toSeq.sorted.mkString(",")}")
      case None =>
        Right(selectedStages.flatMap(st =>
          sites.values.filter(_.stage == st).toSeq.sortBy(_.refDes)))
    }
    selected.map(_.map { sc =>
      val valid = validSpansFor(sc.refDes, args.homebrewQartod).contains(args.span)
      Launch(
        name = s"${sc.refDes}--${args.span}",
        site = sc.refDes, span = args.span, stage = sc.stage,
        worker = ConfigRegistry.workerFor(exceptions, sc.refDes, args.span),
        valid = valid,
        staggerSeconds = 10,
        parameters = Map(
          "site" -> sc.refDes,
          "timeString" -> args.time,
          "span" -> args.span,
          "spanString" -> ConfigRegistry.SpanStrings.getOrElse(args.span, args.span),
          "threshold" -> args.threshold.toString,
          "stage" -> sc.stage.toString,
          "homebrew_qartod" -> args.homebrewQartod.toString,
          "express" -> args.express.toString,
          "sync_to_s3" -> args.sync.toString,
          "s3_bucket" -> bucket))
    })
  }

  def main(argv: Array[String]): Unit = {
    val today = java.time.LocalDate.now().toString
    val result = for {
      args <- parseArgs(argv.toIndexedSeq, today)
      sitesPath = sys.env.getOrElse("GRAFT_SITES_CSV",
        "src/test/resources/params/sites.csv")
      plan <- buildPlan(args, ConfigRegistry.loadSites(sitesPath))
    } yield (args, plan)
    result match {
      case Left(err) =>
        System.err.println(err)
        sys.exit(2)
      case Right((args, plan)) =>
        plan.foreach { l =>
          val status = if (!l.valid) "SKIP (invalid span)"
                       else if (args.run) "RUN" else "PLAN"
          println(s"$status ${l.name} stage=${l.stage} " +
            s"worker=${l.worker.cpu}vcpu_${l.worker.memGb}gb ${l.parameters}")
        }
    }
  }
}
