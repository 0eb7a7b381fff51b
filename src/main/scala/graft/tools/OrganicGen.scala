package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Organic (non-replicated) scale-up generator.
  *
  * [[ScaleUp]] replicates the base corpus as disjoint shifted copies —
  * by construction, per-key group sizes and the vocabulary stay FIXED
  * while group counts multiply. Real growth does the opposite for
  * categorical domains: the driver's own generator (measured across
  * /root/testdata/sf0.01 → sf0.1) grows entity domains LINEARLY
  * (customers, parts, suppliers, orders, users, docs ×10) while
  * holding categorical domains FIXED (31-word vocabulary, 20 sources,
  * 25 brands, 6 types, 5 segments/langs/event types, one 30-day event
  * window) and grows embeddings ×4 per decade (n = 2000·g^0.602).
  * This generator reproduces that growth law at arbitrary `growth`, so
  * per-group cells get `growth`× heavier and the FIXED shingle space
  * meets `growth`× more documents — exactly the cardinality cliffs
  * (LSH band saturation, per-cell pair blowup, window heaviness) the
  * shifted replica structurally cannot exhibit.
  *
  * Distributions mirror the measured base marginals: uniform 30-word
  * common vocab + a ~0.1%/token rare "dup" word, 10–100 words/doc,
  * ~0.16% planted exact-duplicate texts, exponential(50) event values
  * (median 34.7 ✓), unit-norm embeddings with weak label structure
  * (within-cluster cosine ≈ 0.06), 1–7 lines/order (mean 4), the same
  * date ranges and categorical values. Everything is a pure function
  * of (table, id) via xxhash64 — no RNG state, fully reproducible.
  *
  * Usage: runMain graft.tools.OrganicGen <dstDir> [growth=10]
  * (growth is relative to the sf0.1 base counts).
  */
object OrganicGen {

  private def u(salt: String, cols: Column*): Column =
    (abs(xxhash64((lit(salt) +: cols): _*)) % 1000000000L).cast("double") / 1e9

  private def h(salt: String, cols: Column*): Column =
    abs(xxhash64((lit(salt) +: cols): _*))

  private def pick(salt: String, id: Column, vals: Seq[String]): Column =
    element_at(array(vals.map(lit): _*), (h(salt, id) % vals.size).cast("int") + 1)

  val CommonVocab: Seq[String] = Seq(
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "join", "filter", "big", "group", "hash", "customer",
    "sort", "order", "slow", "line", "part", "fast", "the", "row",
    "agg", "key", "query", "a", "scan", "batch")

  def main(args: Array[String]): Unit = {
    val dst = if (args.length > 0) args(0) else "/tmp/organic1.0"
    val growth = if (args.length > 1) args(1).toDouble else 10.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-organicgen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nCust = (15000 * growth).toLong
    val nSupp = (1000 * growth).toLong
    val nPart = (20000 * growth).toLong
    val nOrders = (150000 * growth).toLong
    val nEvents = (100000 * growth).toLong
    val nUsers = (1500 * growth).toLong
    val nDocs = (5000 * growth).toLong
    val nEmb = (2000 * math.pow(growth, 0.602)).toLong // driver law: x4 per decade
    val id = col("id")

    val region = spark.range(5).select(id.cast("int").as("r_regionkey"),
      element_at(array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST").map(lit): _*),
        id.cast("int") + 1).as("r_name"))

    val nation = spark.range(25).select(id.cast("int").as("n_nationkey"),
      concat(lit("NATION_"), id).as("n_name"),
      (id % 5).cast("int").as("n_regionkey"))

    val customer = spark.range(nCust).select(
      id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      (h("cn", id) % 25).cast("int").as("c_nationkey"),
      round(u("cb", id) * 11000 - 1000, 2).as("c_acctbal"),
      pick("cm", id, Seq("MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD", "FURNITURE"))
        .as("c_mktsegment"))

    val supplier = spark.range(nSupp).select(
      id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      (h("sn", id) % 25).cast("int").as("s_nationkey"),
      round(u("sb", id) * 11000 - 1000, 2).as("s_acctbal"))

    val part = spark.range(nPart).select(
      id.as("p_partkey"),
      concat(
        pick("pa", id, Seq("large", "hot", "blue", "small", "red", "green", "dim", "shiny")),
        lit(" "),
        pick("pn", id, Seq("ring", "bolt", "washer", "gear", "clip", "pin", "rod", "cap")))
        .as("p_name"),
      concat(lit("Brand#"), h("pb", id) % 25).as("p_brand"),
      pick("pt", id, Seq("ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO")).as("p_type"),
      ((h("ps", id) % 50) + 1).cast("int").as("p_size"),
      (lit(900.0) + (h("pp", id) % 1000).cast("double") / 10).as("p_retailprice"))

    // orders span 1995-01-01 .. 2001-08-01 (the measured base range)
    val orderEpochDays = datediff(lit("2001-08-01").cast("date"), lit("1995-01-01").cast("date"))
    val orders = spark.range(nOrders).select(
      id.as("o_orderkey"),
      (h("oc", id) % nCust).as("o_custkey"),
      pick("os", id, Seq("O", "P", "F")).as("o_orderstatus"),
      round(lit(1000.0) + u("ot", id) * u("ot2", id) * 499000, 2).as("o_totalprice"),
      date_add(lit("1995-01-01").cast("date"),
        (u("od", id) * orderEpochDays).cast("int")).cast("timestamp").as("o_orderdate"),
      pick("op", id, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .as("o_orderpriority"))

    // 1..7 lines per order (mean 4 → rows ≈ 4·nOrders, the base ratio)
    val lineitem = orders
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(1), ((h("ln", col("o_orderkey")) % 7) + 1).cast("int"))).as("l_linenumber"))
      .select(
        col("o_orderkey").as("l_orderkey"),
        (h("lp", col("o_orderkey"), col("l_linenumber")) % nPart).as("l_partkey"),
        (h("ls", col("o_orderkey"), col("l_linenumber")) % nSupp).as("l_suppkey"),
        col("l_linenumber"),
        ((h("lq", col("o_orderkey"), col("l_linenumber")) % 50) + 1).cast("double").as("l_quantity"),
        col("o_orderdate"))
      .withColumn("l_extendedprice",
        round(col("l_quantity") * (lit(900.0) +
          u("lu", col("l_orderkey"), col("l_linenumber")) * 1200), 2))
      .withColumn("l_discount",
        (h("ld", col("l_orderkey"), col("l_linenumber")) % 11).cast("double") / 100)
      .withColumn("l_tax",
        (h("lt", col("l_orderkey"), col("l_linenumber")) % 9).cast("double") / 100)
      .withColumn("l_returnflag",
        pick("lr", col("l_orderkey") * 100 + col("l_linenumber"), Seq("R", "A", "N")))
      .withColumn("l_linestatus",
        pick("ll", col("l_orderkey") * 100 + col("l_linenumber"), Seq("O", "F")))
      .withColumn("l_shipdate",
        date_add(col("o_orderdate").cast("date"),
          ((h("lsd", col("l_orderkey"), col("l_linenumber")) % 95) + 1).cast("int"))
          .cast("timestamp"))
      .drop("o_orderdate")

    // one 30-day window regardless of growth (the driver's law): more
    // users, same period — daily/hourly cells get growth-x heavier
    val evBase = lit("2024-01-01 00:00:00").cast("timestamp")
    val events = spark.range(nEvents).select(
      id.as("event_id"),
      timestamp_micros(unix_micros(evBase) +
        (u("et", id) * 30L * 86400 * 1000000L).cast("long")).as("ts"),
      (h("eu", id) % nUsers).as("user_id"),
      pick("ee", id, Seq("view", "click", "purchase", "signup", "error")).as("event_type"),
      // exponential(50): mean 50, median 34.7 — the measured base shape
      round(-log(greatest(u("ev", id), lit(1e-9))) * 50, 2).as("value"),
      format_string("{\"k\": %d}", h("ep", id) % 100).as("props"))

    // documents: FIXED 30-word vocab + ~0.1%/token rare "dup" word;
    // ~0.16% of docs are exact copies of their predecessor (planted
    // duplicates); 10..100 words per doc
    val vocabCol = array(CommonVocab.map(lit): _*)
    val baseId = when(id % 625 === 624, id - 1).otherwise(id).as("base_id")
    val documents = spark.range(nDocs).select(id.as("doc_id"), baseId)
      .withColumn("n_words", (h("dn", col("base_id")) % 91 + 10).cast("int"))
      .withColumn("text", array_join(
        transform(sequence(lit(0), col("n_words") - 1), i =>
          when(u("dw_rare", col("base_id"), i) < 0.001, lit("dup"))
            .otherwise(element_at(vocabCol,
              (h("dw", col("base_id"), i) % CommonVocab.size).cast("int") + 1))),
        " "))
      .withColumn("lang",
        when(u("dl", col("base_id")) < 0.41, "en")
          .when(u("dl", col("base_id")) < 0.56, "fr")
          .when(u("dl", col("base_id")) < 0.71, "zh")
          .when(u("dl", col("base_id")) < 0.86, "de")
          .otherwise("es"))
      .withColumn("source", concat(lit("src"), h("ds", col("base_id")) % 20))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")

    // embeddings: unit-norm, weak label structure (within-cluster
    // cosine ≈ 0.06 like the base): normalize(0.08·center_label + g)
    // with g an Irwin-Hall(3) approximate Gaussian per (id, dim)
    val dims = 64
    def gauss(salt: String, a: Column, b: Column): Column =
      u(salt + "1", a, b) + u(salt + "2", a, b) + u(salt + "3", a, b) - 1.5
    val emb = spark.range(nEmb)
      .select(id.as("vec_id"), (h("el", id) % 10).cast("int").as("label"))
      .withColumn("raw", transform(sequence(lit(0), lit(dims - 1)), j =>
        gauss("eg", col("vec_id"), j) + lit(0.08) * gauss("ec", col("label"), j)))
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .withColumn("embedding",
        transform(col("raw"), x => (x / col("nrm")).cast("float")))
      .select("vec_id", "embedding", "label")

    val tables: Seq[(String, DataFrame, Int)] = Seq(
      ("region", region, 1), ("nation", nation, 1),
      ("customer", customer, math.max(1, (growth / 2).toInt)),
      ("supplier", supplier, 1),
      ("part", part, math.max(1, (growth / 2).toInt)),
      ("orders", orders, math.max(1, growth.toInt)),
      ("lineitem", lineitem, math.max(1, growth.toInt * 2)),
      ("events", events, math.max(1, growth.toInt)),
      ("documents", documents, math.max(1, (growth / 2).toInt)),
      ("embeddings", emb, 1))
    tables.foreach { case (name, df, parts) =>
      df.coalesce(parts).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[organic] $name -> $dst/$name.parquet")
    }
    spark.stop()
  }
}
