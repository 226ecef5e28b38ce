"""Round-2 batch 42 (this run): user-level event-type co-occurrence
lift and curriculum-learning stage assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.functions.rounding import round6, round6_sql
from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# event-type co-occurrence lift across users
# ---------------------------------------------------------------------------

_COOC_SQL = f"""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
m AS (SELECT event_type, count(*) AS n_with FROM ut GROUP BY event_type),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b,
       CAST(p.n_both AS BIGINT) AS n_both,
       CAST(ma.n_with AS BIGINT) AS n_a,
       CAST(mb.n_with AS BIGINT) AS n_b,
       CAST((p.n_both * n.n_users * 1000) // (ma.n_with * mb.n_with) AS BIGINT)
         AS lift_milli,
       {round6_sql(
           "CAST(p.n_both AS DOUBLE) * n.n_users / (CAST(ma.n_with AS DOUBLE) * mb.n_with)"
       )} AS lift
FROM p
JOIN m ma ON p.type_a = ma.event_type
JOIN m mb ON p.type_b = mb.event_type
CROSS JOIN n
"""


@register("type_cooccurrence_lift", _COOC_SQL)
def type_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level co-occurrence lift between event-type pairs — do the
    same PEOPLE who do A also do B (market_basket_rules answers this
    for order baskets; this is the audience-overlap version)? The
    distinct (user, type) shrink makes the pair join a ≤5-per-user
    self-join; lift = P(A∧B)/(P(A)P(B)) is computed as the
    cross-multiplied integer (n_both·N·10³)//(n_a·n_b) beside the
    conventional double. Canonical a<b ordering halves the grid."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ut.agg(F.count_distinct("user_id").alias("n_users"))
    m = ut.groupBy("event_type").agg(F.count("*").alias("n_with"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    j = (
        p.join(
            F.broadcast(m.withColumnRenamed("event_type", "type_a").withColumnRenamed("n_with", "n_a")),
            "type_a",
        )
        .join(
            F.broadcast(m.withColumnRenamed("event_type", "type_b").withColumnRenamed("n_with", "n_b")),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
    )
    lift = (
        F.col("n_both").cast("double")
        * F.col("n_users")
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return j.select(
        "type_a",
        "type_b",
        F.col("n_both").cast("long").alias("n_both"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr("(n_both * n_users * 1000) div (n_a * n_b)").cast("long").alias(
            "lift_milli"
        ),
        round6(lift).alias("lift"),
    )


# ---------------------------------------------------------------------------
# curriculum-learning stages by document difficulty
# ---------------------------------------------------------------------------

_CURR_SQL = """
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS n_tok
  FROM documents
),
staged AS (
  SELECT doc_id, n_tok, ntile(4) OVER (ORDER BY n_tok, doc_id) AS stage
  FROM d WHERE n_tok > 0
),
tok AS (
  SELECT s.stage, t.tok
  FROM staged s,
       (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS tok
        FROM documents) t
  WHERE s.doc_id = t.doc_id
),
df AS (
  SELECT tok, count(DISTINCT sd.doc_id) AS df
  FROM (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS tok
        FROM documents) sd
  GROUP BY tok
),
h AS (
  SELECT tok.stage, count(*) AS n_tokens,
         sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS hapax_tokens
  FROM tok JOIN df USING (tok) GROUP BY tok.stage
),
s AS (
  SELECT stage, count(*) AS n_docs, sum(n_tok) AS tok_mass,
         (sum(n_tok) * 1000) // count(*) AS mean_len_milli
  FROM staged GROUP BY stage
)
SELECT s.stage,
       CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(s.tok_mass AS BIGINT) AS token_mass,
       CAST(s.mean_len_milli AS BIGINT) AS mean_len_milli,
       CAST(h.hapax_tokens AS BIGINT) AS hapax_tokens,
       CAST((h.hapax_tokens * 1000000) // h.n_tokens AS BIGINT) AS hapax_share_micro
FROM s JOIN h ON s.stage = h.stage
"""


@register("ns_curriculum_stages", _CURR_SQL)
def ns_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning stage assignment: documents ntile'd into 4
    difficulty stages by token length (the classic short-to-long
    curriculum), each stage profiled by document count, token mass,
    mean length, and hapax share (corpus-frequency-1 tokens — rare-
    word density rises with stage if the curriculum is meaningful).
    The stage boundary is a total-ordered ntile; the hapax join is the
    broadcast-vocabulary pattern from ns_vocab_coverage. This is the
    ordering step a data loader consumes before ns_sequence_packing
    batches each stage."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks_col = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    d = docs.select("doc_id", F.size(toks_col).alias("n_tok")).filter(F.col("n_tok") > 0)
    staged = d.select(
        "doc_id",
        "n_tok",
        F.ntile(4).over(Window.orderBy("n_tok", "doc_id")).alias("stage"),
    )
    tok = docs.select("doc_id", F.explode(toks_col).alias("tok"))
    df = tok.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    jt = tok.join(staged.select("doc_id", "stage"), "doc_id").join(
        F.broadcast(df), "tok"
    )
    h = jt.groupBy("stage").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("hapax_tokens"),
    )
    s = staged.groupBy("stage").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("tok_mass"),
        F.expr("(sum(n_tok) * 1000) div count(*)").alias("mean_len_milli"),
    )
    return s.join(h, "stage").select(
        "stage",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tok_mass").cast("long").alias("token_mass"),
        F.col("mean_len_milli").cast("long").alias("mean_len_milli"),
        F.col("hapax_tokens").cast("long").alias("hapax_tokens"),
        F.expr("(hapax_tokens * 1000000) div n_tokens").cast("long").alias(
            "hapax_share_micro"
        ),
    )
