package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.{StoreCatalog, StoreDef, StoreSource}

/** Durable snapshot of the whole registry state — every [[MvCatalog]]
  * rollup/join def, every [[graft.operators.StoreCatalog]] store def,
  * and every [[StatsCatalog]] table-statistics entry (r19: row counts +
  * base64 HLL sketches, so a restarted maintainer keeps its optimizer
  * statistics mergeable) — as ONE JSON document written
  * tmp+atomic-rename.
  *
  * Why this exists: both catalogs are process-scoped by design (the
  * rewrite rule and the maintenance sweep consult in-JVM maps), which
  * makes a maintainer restart lose every registration. Without
  * persistence the documented recovery is "re-materialize" — an
  * O(corpus) rebuild of each store and view, which at the target scale
  * is exactly the cost the incremental-refresh design exists to avoid.
  * With it, the production maintenance loop is
  * `load → maintainAll → save`: the reload resumes each def at its
  * SAVED watermark and the sweep applies only the changelog the process
  * missed while it was down — O(downtime churn), never O(corpus).
  *
  * Staleness is handled by the existing contracts, not re-validated
  * here: a saved watermark is just a cursor; `refreshStep` refuses one
  * that is no longer a snapshot of its base (history rewritten →
  * re-materialize), and the sweep reports that per entry without
  * blocking the rest. What load DOES validate is existence: a def whose
  * stored artifact (mvPath / store root) is gone is skipped with the
  * reason — registering it would hand the optimizer a scan of deleted
  * files.
  *
  * Concurrency: save snapshots the live maps (each map's iteration is
  * weakly consistent); run it from the single maintainer, same
  * discipline as the sweep itself. Load is additive replace-by-name —
  * defs registered since the save survive a reload.
  */
object CatalogPersistence {

  private val mapper = new ObjectMapper()

  /** One reload outcome: `loaded` = the def was registered; otherwise
    * `reason` says why it was skipped (missing artifact, bad record).
    */
  final case class LoadResult(
      name: String,
      kind: String,
      loaded: Boolean,
      reason: Option[String])

  // -------------------------------------------------------------------
  // save
  // -------------------------------------------------------------------

  def save(path: String): Unit = {
    val root = mapper.createObjectNode()
    root.put("version", 1)
    val mvs = root.putArray("mvs")
    MvCatalog.allDefs.foreach { d =>
      val n = mvs.addObject()
      n.put("name", d.name)
      n.put("basePath", d.basePath)
      val ks = n.putArray("keys"); d.keys.foreach(ks.add)
      val ms = n.putObject("measures")
      d.measures.toSeq.sortBy(_._1).foreach { case (arg, m) =>
        val mn = ms.putObject(arg)
        m.sum.foreach(mn.put("sum", _))
        m.cnt.foreach(mn.put("cnt", _))
        m.min.foreach(mn.put("min", _))
        m.max.foreach(mn.put("max", _))
      }
      d.countStar.foreach(n.put("countStar", _))
      n.put("mvPath", d.mvPath)
      n.put("schema", d.mvSchema.json)
      d.watermark.foreach(n.put("watermark", _))
      d.rows.foreach(n.put("rows", _))
    }
    val joins = root.putArray("joins")
    MvCatalog.allJoinDefs.foreach { d =>
      val n = joins.addObject()
      n.put("name", d.name)
      n.put("factPath", d.factPath)
      n.put("dimPath", d.dimPath)
      val jk = n.putArray("joinKeys")
      d.joinKeys.foreach { case (f, dm) =>
        val p = jk.addArray(); p.add(f); p.add(dm): Unit
      }
      n.put("mvPath", d.mvPath)
      n.put("schema", d.mvSchema.json)
      d.watermark.foreach(n.put("watermark", _))
      d.rows.foreach(n.put("rows", _))
      d.dimWatermark.foreach(n.put("dimWatermark", _))
    }
    val stores = root.putArray("stores")
    StoreCatalog.describe().foreach { d =>
      val n = stores.addObject()
      n.put("name", d.name)
      n.put("kind", d.kind)
      n.put("root", d.root)
      d.source.foreach { s =>
        val sn = n.putObject("source")
        sn.put("basePath", s.basePath)
        sn.put("column", s.column)
        sn.put("idCol", s.idCol)
        sn.put("watermark", s.watermark): Unit
      }
    }
    val stats = root.putArray("stats")
    StatsCatalog.describe().foreach { st =>
      val n = stats.addObject()
      n.put("path", st.path)
      n.put("rows", st.rows)
      n.put("updatedMs", st.updatedMs)
      val cs = n.putObject("cols")
      st.cols.toSeq.sortBy(_._1).foreach { case (c, cst) =>
        val cn = cs.putObject(c)
        cn.put("ndv", cst.ndv)
        cn.put("sketch",
          java.util.Base64.getEncoder.encodeToString(cst.sketch)): Unit
      }
      // joint combo sketches (r20): same shape, comboKey-named entries
      val cbs = n.putObject("combos")
      st.combos.toSeq.sortBy(_._1).foreach { case (c, cst) =>
        val cn = cbs.putObject(c)
        cn.put("ndv", cst.ndv)
        cn.put("sketch",
          java.util.Base64.getEncoder.encodeToString(cst.sketch)): Unit
      }
    }
    val bytes = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
    val target = Paths.get(path)
    Option(target.getParent).foreach(p => Files.createDirectories(p): Unit)
    // a crash between a PREDECESSOR's tmp write and its atomic move
    // orphans its tmp forever; the single-maintainer contract makes any
    // existing tmp a crashed predecessor's, so reclaim it here (same
    // recovery discipline as SplitStore's ledger tmps)
    Option(target.getParent).foreach { parent =>
      val prefix = target.getFileName.toString + ".tmp-"
      val listing = Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith(prefix))
          .foreach(p => Files.deleteIfExists(p): Unit)
      } finally listing.close()
    }
    val tmp = Paths.get(path + s".tmp-${System.nanoTime()}")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  // -------------------------------------------------------------------
  // load
  // -------------------------------------------------------------------

  def load(path: String): Seq[LoadResult] = {
    val p = Paths.get(path)
    require(Files.exists(p), s"catalog file $path does not exist")
    val root = mapper.readTree(Files.readAllBytes(p))
    val v = root.path("version").asInt(-1)
    require(v == 1, s"catalog file $path has unsupported version $v")
    import scala.jdk.CollectionConverters._
    def opt(n: JsonNode, f: String): Option[String] =
      if (n.has(f)) Some(n.path(f).asText()) else None
    def optL(n: JsonNode, f: String): Option[Long] =
      if (n.has(f)) Some(n.path(f).asLong()) else None
    // existence through the Hadoop FileSystem of the path's OWN scheme
    // (hdfs://, s3a://, file:, scheme-less all resolve correctly — the
    // r17 java.nio-only check reported every remote-rooted artifact
    // missing and silently degraded its reload to an O(corpus)
    // re-materialize); a filesystem that cannot even be reached counts
    // as missing, which load() reports rather than registering a def
    // whose scans would fail later
    def artifactExists(raw: String): Boolean =
      try {
        val hp = new org.apache.hadoop.fs.Path(raw)
        val conf = org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sparkContext.hadoopConfiguration)
          .getOrElse(new org.apache.hadoop.conf.Configuration())
        hp.getFileSystem(conf).exists(hp)
      } catch { case scala.util.control.NonFatal(_) => false }
    def entry(name: String, kind: String, store: String)(
        register: => Unit): LoadResult =
      if (!artifactExists(store))
        LoadResult(name, kind, loaded = false,
          Some(s"stored artifact missing at $store"))
      else try { register; LoadResult(name, kind, loaded = true, None) }
      catch {
        case scala.util.control.NonFatal(e) =>
          LoadResult(name, kind, loaded = false,
            Some("error: " + Option(e.getMessage).getOrElse(e.toString)
              .replaceAll("\\s+", " ").take(200)))
      }
    val mvs = root.path("mvs").elements().asScala.toSeq.map { n =>
      entry(n.path("name").asText(), "rollup", n.path("mvPath").asText()) {
        MvCatalog.register(MvDef(
          name = n.path("name").asText(),
          basePath = n.path("basePath").asText(),
          keys = n.path("keys").elements().asScala.map(_.asText()).toSeq,
          measures = n.path("measures").fields().asScala.map { e =>
            val m = e.getValue
            e.getKey -> MvMeasure(
              sum = opt(m, "sum"), cnt = opt(m, "cnt"),
              min = opt(m, "min"), max = opt(m, "max"))
          }.toMap,
          countStar = opt(n, "countStar"),
          mvPath = n.path("mvPath").asText(),
          mvSchema = DataType.fromJson(n.path("schema").asText())
            .asInstanceOf[StructType],
          watermark = optL(n, "watermark"),
          rows = optL(n, "rows")))
      }
    }
    val joins = root.path("joins").elements().asScala.toSeq.map { n =>
      entry(n.path("name").asText(), "join", n.path("mvPath").asText()) {
        MvCatalog.registerJoin(JoinMvDef(
          name = n.path("name").asText(),
          factPath = n.path("factPath").asText(),
          dimPath = n.path("dimPath").asText(),
          joinKeys = n.path("joinKeys").elements().asScala.map { pair =>
            val it = pair.elements().asScala.toSeq
            (it.head.asText(), it(1).asText())
          }.toSeq,
          mvPath = n.path("mvPath").asText(),
          mvSchema = DataType.fromJson(n.path("schema").asText())
            .asInstanceOf[StructType],
          watermark = optL(n, "watermark"),
          rows = optL(n, "rows"),
          dimWatermark = optL(n, "dimWatermark")))
      }
    }
    val stores = root.path("stores").elements().asScala.toSeq.map { n =>
      entry(n.path("name").asText(), n.path("kind").asText(),
        n.path("root").asText()) {
        StoreCatalog.register(StoreDef(
          name = n.path("name").asText(),
          kind = n.path("kind").asText(),
          root = n.path("root").asText(),
          source =
            if (!n.has("source")) None
            else {
              val s = n.path("source")
              Some(StoreSource(
                s.path("basePath").asText(), s.path("column").asText(),
                s.path("idCol").asText(), s.path("watermark").asLong()))
            }))
      }
    }
    // table statistics: absent in pre-r19 documents (path() reads as an
    // empty array), and a stats entry whose table vanished is skipped —
    // stale NDVs on a re-created path would mis-arm the auto optimizer
    val stats = root.path("stats").elements().asScala.toSeq.map { n =>
      entry(n.path("path").asText(), "stats", n.path("path").asText()) {
        StatsCatalog.register(StatsCatalog.TableStats(
          path = n.path("path").asText(),
          rows = n.path("rows").asLong(),
          cols = n.path("cols").fields().asScala.map { e =>
            e.getKey -> StatsCatalog.ColStats(
              e.getValue.path("ndv").asLong(),
              java.util.Base64.getDecoder
                .decode(e.getValue.path("sketch").asText()))
          }.toMap,
          updatedMs = n.path("updatedMs").asLong(),
          // absent in pre-r20 documents: path() reads as no fields
          combos = n.path("combos").fields().asScala.map { e =>
            e.getKey -> StatsCatalog.ColStats(
              e.getValue.path("ndv").asLong(),
              java.util.Base64.getDecoder
                .decode(e.getValue.path("sketch").asText()))
          }.toMap))
      }
    }
    mvs ++ joins ++ stores ++ stats
  }
}
