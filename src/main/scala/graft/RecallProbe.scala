package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Round-11 evidence probe for the s8_beam_recall_full parameter and
  * target choice: prints beam-search recall@10 vs brute-force truth
  * (20 probes) over the FULL embeddings table of SPARK_GRAFT_SF_DIR —
  * the uncapped engine run the gate entry pins with `meets_target`
  * (target 0.3). Measured on the isotropic gate embeddings (the
  * distance-concentration hard case; clustered real-world corpora
  * sit far higher), local[32]:
  *
  *   sf dir        corpus  graph k=10 defaults   k=20,beam=40,r=6,s=7
  *   sf0.01           500  0.925 (14 s)          1.000 (20 s)
  *   sf0.1          2,000  0.625 (18 s)          0.980 (21 s)
  *   sf1 (gen)     20,000  0.275 (29 s)          0.710 (39 s)
  *
  * The default-parameter column is why the full lane serves with
  * graphK=20/beam=40: at 20k isotropic vectors the degree-10 graph
  * starves the beam (0.275 — would FAIL a 0.3 pin), while degree-20
  * edges + a 40-wide beam buy recall 0.710 for linear extra cost —
  * rounds·n·cap² build pairs, steps·beam·(2k+1) serve rows. The 0.3
  * target then holds a 2.4x margin at the largest gate corpus while
  * still failing the gate on a real construction/serve regression
  * (a broken descent round or beam expansion more than halves recall
  * at these sizes). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    def knob(n: String, d: Int) = sys.env.getOrElse(n, d.toString).toInt
    val (ro, be, st, se) = (knob("PROBE_ROUNDS", 6), knob("PROBE_BEAM", 40),
      knob("PROBE_STEPS", 7), knob("PROBE_SEEDS", 20))
    val gk = knob("PROBE_GRAPHK", 20)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val r = Similarity.beamSearchRecall(emb, probeMax = 20, target = 0.3,
      rounds = ro, beam = be, steps = st, seeds = se, graphK = gk)
      .collect()(0)
    println(f"[probe] dir=$dir corpus=${emb.count()}%d " +
      f"rounds=$ro beam=$be steps=$st seeds=$se graphK=$gk " +
      f"recall=${r.getDouble(2)}%.3f meets=${r.getBoolean(3)} " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
