package graft.pipeline

import graft.operators.{Cleaning, MLOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** The reference's flagship pipeline (BigDataProject.R:41-130 →
  * car_prices_cleaned.csv / car_prices_ml_ready.csv), rebuilt as one lazy
  * DataFrame chain with two driver round-trips (quantile bounds, bucket
  * breaks) — the distributed analog of R's eager whole-table passes.
  *
  * Capping: the script text applies 1.5*IQR to predictors
  * (BigDataProject.R:99-115), but the committed golden outputs were
  * produced by 1%/99% winsorization of ALL numeric columns including
  * car_id and price (verified: cleaned car_id = 3.04 = quantile(.01),
  * 202.96 = quantile(.99); horsepower max 207 = quantile(.99); price max
  * 40802.72). `CapMethod` selects either; golden tests use Winsor.
  */
object CarPricePipeline {

  sealed trait CapMethod
  case object WinsorGolden extends CapMethod // matches committed outputs
  case object IqrScript extends CapMethod    // matches current script text

  /** Columns force-cast to double (BigDataProject.R:66-75). */
  val castCols: Seq[String] = Seq("horsepower", "peakrpm", "boreratio",
    "stroke", "compressionratio", "citympg", "highwaympg", "price")

  /** ML feature columns (BigDataProject.R:277-281). */
  val mlFeatures: Seq[String] = Seq("horsepower", "enginesize", "curbweight",
    "citympg", "highwaympg", "carwidth", "carlength")

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** The raw file's 26 columns in header order with their true types —
    * the explicit-schema S1 read (one scan, no inference pass; q99 and
    * the reference's `read_csv` col_types contract). */
  val rawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val str = Set("CarName", "fueltype", "aspiration", "doornumber", "carbody",
      "drivewheel", "enginelocation", "enginetype", "cylindernumber", "fuelsystem")
    val dbl = Set("wheelbase", "carlength", "carwidth", "carheight",
      "boreratio", "stroke", "compressionratio", "price")
    val order = Seq("car_ID", "symboling", "CarName", "fueltype", "aspiration",
      "doornumber", "carbody", "drivewheel", "enginelocation", "wheelbase",
      "carlength", "carwidth", "carheight", "curbweight", "enginetype",
      "cylindernumber", "enginesize", "fuelsystem", "boreratio", "stroke",
      "compressionratio", "horsepower", "peakrpm", "citympg", "highwaympg",
      "price")
    StructType(order.map(c => StructField(c,
      if (str(c)) StringType else if (dbl(c)) DoubleType else IntegerType)))
  }

  /** S1 with the explicit [[rawSchema]] (no inference scan). */
  def loadExplicit(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(rawSchema).csv(path)

  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq

  /** Full cleaning stage: schema normalize → brand → cast → impute →
    * cap → quartile price_bucket → log_price. */
  def clean(raw: DataFrame, cap: CapMethod = WinsorGolden): DataFrame = {
    val lowered = Cleaning.lowercaseColumns(raw)
    val branded = lowered.withColumn("brand", Cleaning.firstWord(col("carname")))
    val casted = Cleaning.castColumns(branded, castCols, "double")
    val nums = numericCols(casted)
    val factorCols = Seq("fueltype", "aspiration", "doornumber", "carbody",
      "drivewheel", "enginelocation", "enginetype", "cylindernumber",
      "fuelsystem", "brand").filter(casted.columns.contains)
    // plan truncation between phases (round 17; guide §3.3/§7.3): the
    // impute/winsor stages stack ~16 per-column CASE chains, and every
    // later driver round-trip (bucket breaks, the caller's fits, the
    // final emit) re-analyzed the whole deepening tree — measured as
    // q113's dominant cost (27 sub-100 ms jobs under ~2.5 s of driver
    // planning). localCheckpoint preserves rows AND partitioning (the
    // golden partition the seeded fits pin), only the lineage is cut.
    val imputed = Cleaning.modeImpute(Cleaning.medianImpute(casted, nums),
      factorCols).localCheckpoint(true)
    val capped = (cap match {
      case WinsorGolden => Cleaning.winsorize(imputed, nums, 0.01, 0.99)
      case IqrScript    => Cleaning.iqrCap(imputed, nums.filterNot(_ == "price"))
    }).localCheckpoint(true)
    Cleaning.quantileBucket(capped, "price", "price_bucket")
      .withColumn("log_price", log1p(col("price")))
  }

  /** ML-ready matrix: 7 features + full-rank brand dummies (R dummyVars
    * naming/ordering) + price — matches car_prices_ml_ready.csv. */
  def mlReady(cleaned: DataFrame): DataFrame = {
    // dummies built inline in one select: name-based re-selection of
    // "brand.nissan" vs "brand.Nissan" would be ambiguous under Spark's
    // case-insensitive resolver (both are real levels — raw typos)
    val dummies = MLOps.rLevels(cleaned, "brand").drop(1).map(v =>
      when(col("brand") === v, 1).otherwise(0).as(s"brand.$v"))
    cleaned.select(mlFeatures.map(col) ++ dummies :+ col("price"): _*)
  }
}
