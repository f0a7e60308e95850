"""Relational operator slices: the SQL-expressible skeleton of the engine.

Two families:

1. Extraction analogs over `documents`/`events` — the reference's T/F/O/J/A
   ops (SURVEY.md §2) re-expressed as Catalyst-native column expressions and
   window functions, so the DuckDB oracle can verify the exact semantics the
   pandas-UDF kernel implements (same regexes, same thresholds).

2. Classic relational queries over the TPC-H-ish tables — aggregation, joins
   (broadcast for small dims), windows, sessionization — demonstrating the
   shuffle-conscious plan shapes the 100 TB deployment uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------- extraction analogs (T ops)

def t1_clean_punct_runs(docs: DataFrame) -> DataFrame:
    """T1 punctuation-run collapse (result_formatter.py:228-231) as pure
    regexp_replace chain — backreference-free so RE2 oracles can run it."""
    c = F.col("text")
    c = F.regexp_replace(c, r"\.{4,}", "...")
    c = F.regexp_replace(c, "·{4,}", "···")
    c = F.regexp_replace(c, "_{4,}", "___")
    return docs.select("doc_id", c.alias("cleaned"))


def t5_title_format(docs: DataFrame) -> DataFrame:
    """T5 title normalization (result_formatter.py:247-256): strip leading
    #/- markers, prefix by class; class derived from source parity here."""
    stripped = F.regexp_replace(F.col("text"), r"^[#\-\*\s]+", "")
    is_doc_title = F.col("doc_id") % 2 == 0
    return docs.select(
        "doc_id",
        F.when(is_doc_title, F.concat(F.lit("# "), stripped))
        .otherwise(F.concat(F.lit("## "), stripped)).alias("title"),
    )


def t7_enum_normalize(docs: DataFrame) -> DataFrame:
    """T7 bullet/enumeration normalization (result_formatter.py:272-297)."""
    c = F.trim(F.col("text"))
    c = F.regexp_replace(c, r"^[·•]\s*", "- ")
    c = F.regexp_replace(c, r"^\*\s+", "- ")
    c = F.regexp_replace(c, r"^\((\d+)\)\s*", r"($1) ")
    return docs.select("doc_id", c.alias("normalized"))


def f9_nonempty_filter(docs: DataFrame) -> DataFrame:
    """F9 empty-content drop + F2 degenerate filter (min length)."""
    return docs.filter(
        (F.trim(F.col("text")) != "") & (F.col("n_chars") >= 50)
    ).select("doc_id", "n_chars")


def o3_reindex(docs: DataFrame) -> DataFrame:
    """O3 index reassignment: dense 0-based index per group after filtering
    (result_formatter.py:174-178) as row_number over a window."""
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.filter(F.col("n_chars") >= 100).select(
        "doc_id", "source", (F.row_number().over(w) - 1).alias("new_index")
    )


def a5_concat_per_group(docs: DataFrame) -> DataFrame:
    """A5 markdown concatenation: ordered per-group join with '\\n\\n'
    (result_formatter.py:206-210) via sorted collect_list."""
    return (
        docs.select("source", "doc_id", F.substring("text", 1, 30).alias("frag"))
        .groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "frag"))),
                    lambda s: s["frag"],
                ),
                "\n\n",
            ).alias("markdown"),
            F.count("*").alias("n_blocks"),
        )
    )


def j1_adjacent_merge_events(events: DataFrame) -> DataFrame:
    """J1 formula⋈formula_number adjacency-merge analog over events:
    a 'click' immediately followed by a 'purchase' (same user, event order)
    absorbs its value as a tag; the consumed row is dropped
    (mirrors result_formatter.py:446-534 lead/consume semantics)."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    with_next = events.select(
        "event_id", "user_id", "event_type", "value",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    merged = with_next.withColumn(
        "merged_value",
        F.when(
            (F.col("event_type") == "click") & (F.col("next_type") == "purchase"),
            F.round(F.col("value") + F.col("next_value"), 6),
        ).otherwise(F.round(F.col("value"), 6)),
    )
    # drop consumed rows: a purchase whose previous event was a click
    return merged.filter(
        ~((F.col("event_type") == "purchase") & (F.col("prev_type") == "click"))
    ).select("event_id", "user_id", "event_type", "merged_value")


# ------------------------------------------------- classic relational slices

def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with map-side partial agg."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def order_customer_join(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Broadcast join: customer (small dim) is broadcast, orders never
    shuffles. At 100 TB the fact side stays partition-local."""
    return (
        orders.join(F.broadcast(customer),
                    orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment" if "c_mktsegment" in customer.columns
                 else "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"),
             F.count("*").alias("n_orders"))
    )


def revenue_by_nation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame) -> DataFrame:
    """Two-level broadcast join: orders ⋈ customer ⋈ nation, grouped by
    nation name."""
    return (
        orders.join(F.broadcast(customer),
                    orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation),
              customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue"))
    )


def topk_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Window rank: top-k events by value per user. Single shuffle on
    user_id; rank prunes before any downstream join."""
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.select("user_id", "event_id", "event_type",
                      F.round("value", 6).alias("value"),
                      F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: gap > threshold starts a new session; session id is a
    running sum of boundary flags (X4 readiness-watermark analog,
    pipeline.py:389-428, as pure window algebra)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    flagged = events.select(
        "user_id", "event_id", "ts",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
         .alias("is_start"),
    )
    return flagged.select(
        "user_id", "event_id",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_id"),
    )


def events_hourly_rollup(events: DataFrame) -> DataFrame:
    """Time-bucketed rollup (hypertable-rollup style): truncate to hour,
    aggregate per (hour, event_type)."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("hour", "event_type")
    )


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, segment: str = "BUILDING",
                         cutoff: str = "1996-01-01") -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered both sides of the date cutoff,
    grouped revenue, top 10.

    Plan shape at scale: customer is the small dim (broadcast); orders and
    lineitem join on orderkey (the one big shuffle); partial aggregation
    map-side; TakeOrderedAndProject for the top-10 (each partition keeps 10
    rows). Filters push to the parquet scans. Deterministic tiebreak on
    l_orderkey so LIMIT is stable across engines.
    """
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(cutoff))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit(cutoff))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def q5_local_supplier_volume(customer: DataFrame, orders: DataFrame,
                             lineitem: DataFrame, supplier: DataFrame,
                             nation: DataFrame, region: DataFrame,
                             region_name: str = "ASIA",
                             year_start: str = "1995-01-01",
                             year_end: str = "1996-01-01") -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the local-supplier condition
    (customer and supplier share a nation), revenue per nation.

    Dims (supplier/nation/region/customer) broadcast; lineitem never
    re-shuffles beyond the orderkey join; region/nation filters prune
    before the fact join.
    """
    return (
        customer
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= F.lit(year_start))
                & (F.col("o_orderdate") < F.lit(year_end)))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region),
              (F.col("n_regionkey") == F.col("r_regionkey"))
              & (F.col("r_name") == region_name))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("n_name", "revenue")
    )


def moving_value_avg(events: DataFrame,
                     window_seconds: int = 3600) -> DataFrame:
    """Trailing-window moving average per user: RANGE frame over event time
    (all events within the past `window_seconds`, inclusive), the
    interval-window shape ROWS frames can't express.

    One shuffle on user_id; the frame scan is sorted-run-local within each
    partition. Ties on ts are handled identically on both engines because
    RANGE frames include ALL peer rows at equal ordering value.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-window_seconds, 0)
    )
    return events.select(
        "user_id", "event_id",
        F.round(F.avg("value").over(w), 6).alias("trailing_avg"),
        F.count("*").over(w).alias("n_in_window"),
    )


QUOTA_SALTS = 16


def topk_per_key_salted(df: DataFrame, key_cols: list[str], order_col: str,
                        k: int, rank_name: str = "rank",
                        n_salts: int = QUOTA_SALTS,
                        tie_cols: list[str] | None = None,
                        validate_unique: bool = False) -> DataFrame:
    """Keep the k rows with the smallest `order_col` per key, skew-safely.

    CONTRACT (parameter-level, not prose): the effective ordering
    `(order_col, *tie_cols)` MUST be unique within every key. Two-level
    salting is value-identical to a single window ONLY under that
    uniqueness — with duplicate order values a salt boundary can split a
    tie group and stage 1 would silently drop rows a single window could
    rank within k (review finding). Pass `tie_cols` (e.g. a unique id)
    whenever `order_col` alone can tie; call sites with a naturally
    unique order column (ours is doc_id) may omit it.

    A plain `row_number over (partition by key)` sends EVERY row of a hot
    key to one reducer — the straggler shape when one source dominates a
    corpus (90%-one-source is a realistic web crawl). Two-level instead:

      1. salt by `pmod(xxhash64(order_col, *tie_cols), n_salts)` and take
         the local top-k within each (key, salt) — the hot key fans out
         over n_salts reducers, each sorting ~1/n_salts of it;
      2. re-rank the <= n_salts*k survivors per key globally — the second
         window's worst partition is n_salts*k rows, a constant.

    Value-identical to the single window when `(order_col, *tie_cols)` is
    unique per key: every global top-k row is its salt group's local
    top-k, so stage 1 never drops a winner. Same contract as
    `conversation_rollup`'s salted two-level aggregate (SURVEY §7.3.4).

    Defense in depth: Spark 4's WindowGroupLimit already pushes a
    map-side Partial rank<=k below each exchange (plan-asserted), so
    shuffle VOLUME per key is k x map-partitions even unsalted; what the
    salt adds is bounding the hot key's single-reducer SORT to
    ~1/n_salts of its rows in stage 1 and to n_salts*k rows in stage 2 —
    at 10^6 map partitions an unsalted hot source still lands k x 10^6
    rows on one reducer, the salted form never exceeds n_salts*k.
    """
    if validate_unique:
        # debug/assert mode (round-5 advice): the uniqueness contract is
        # otherwise unenforced and a violation is silently wrong (stage 1
        # can split a tie group across salts and drop a global top-k
        # row). One extra aggregate job over (key, order, ties) counts —
        # run it in tests/first deployments, not per production call.
        dup = (df.groupBy(*key_cols, order_col,
                          *(tie_cols or []))
               .count().filter(F.col("count") > 1).limit(1).collect())
        if dup:
            r = dup[0].asDict()
            raise ValueError(
                "topk_per_key_salted uniqueness contract violated: "
                f"(order_col, *tie_cols) duplicates within a key, e.g. "
                f"{r} — pass tie_cols with a unique id column")
    clash = {"_salt", "_local_rk", rank_name} & set(df.columns)
    if clash:
        raise ValueError(
            f"topk_per_key_salted would clobber existing column(s) "
            f"{sorted(clash)} — rename them or pass a different rank_name")
    ties = list(tie_cols or [])
    order_exprs = [F.asc(order_col)] + [F.asc(c) for c in ties]
    salt = F.pmod(
        F.xxhash64(F.col(order_col), *[F.col(c) for c in ties]),
        F.lit(n_salts))
    w1 = (Window.partitionBy(*key_cols, "_salt")
          .orderBy(*order_exprs))
    pruned = (
        df.withColumn("_salt", salt)
        .withColumn("_local_rk", F.row_number().over(w1))
        .filter(F.col("_local_rk") <= k)
        .drop("_salt", "_local_rk")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_exprs)
    return (
        pruned.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
    )


def quota_per_source(docs: DataFrame, max_per_source: int = 3) -> DataFrame:
    """Domain/source quota capping: keep at most N documents per source
    (deterministic: lowest doc_id wins). The standard pre-training
    anti-domination rule ("no domain may exceed X documents").

    Skew guard (round-3 verdict ask #8): source is a skewed key by nature
    — one crawl domain can be 90% of the corpus — so the top-N runs
    through `topk_per_key_salted` (two-level salted window) instead of a
    single `partitionBy(source)` window; value-identical, straggler-free.
    """
    return topk_per_key_salted(
        docs.select("doc_id", "source", "lang"),
        ["source"], "doc_id", max_per_source, rank_name="rank_in_source",
    ).select("doc_id", "source", "lang", "rank_in_source")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.1) -> DataFrame:
    """Deterministic per-stratum (language) sampling by hash threshold:
    keep a document iff the first 8 hex chars of md5(doc_id) — a uniform
    32-bit value — fall below rate * 2^32. Deterministic (resume/retry
    reproduces the same sample, unlike rand()-based sampling), map-side
    (no shuffle; the hash is a pure function of doc_id), and exactly
    SQL-mirrorable, so the sample itself is oracle-checkable. The standard
    shape for language-rebalancing a multilingual pre-training corpus.
    """
    h = F.conv(F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 8),
        16, 10).cast("long")
    rate = F.lit(float(default_rate))
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(float(r))).otherwise(rate)
    return (
        docs.select("doc_id", "lang", "source",
                    h.alias("sample_hash"), rate.alias("sample_rate"))
        .filter(F.col("sample_hash")
                < F.col("sample_rate") * F.lit(float(1 << 32)))
        .select("doc_id", "lang", "source")
    )


def q10_returned_items(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame,
                       date_start: str = "1995-07-01",
                       date_end: str = "1995-10-01") -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer over a
    quarter, top 20.

    Plan shape at scale: the lineitem⋈orders orderkey join is the one big
    shuffle; customer and nation broadcast; the returnflag + date filters
    push to the scans so only the quarter's returned lines ever join.
    Deterministic tiebreak on c_custkey for a stable LIMIT.
    """
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders.filter((F.col("o_orderdate") >= F.lit(date_start))
                            & (F.col("o_orderdate") < F.lit(date_end))),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


def q4_priority_with_returns(orders: DataFrame, lineitem: DataFrame,
                             date_start: str = "1995-07-01",
                             date_end: str = "1995-10-01") -> DataFrame:
    """TPC-H Q4 shape adapted to this schema (no commit/receipt dates):
    count a quarter's orders per priority where at least one line item was
    returned — the EXISTS semi-join aggregate.

    Left-semi join never widens rows or duplicates orders with multiple
    matching lines; partial aggregation map-side after it.
    """
    returned = lineitem.filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey")
    return (
        orders.filter((F.col("o_orderdate") >= F.lit(date_start))
                      & (F.col("o_orderdate") < F.lit(date_end)))
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"),
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame,
                      month_start: str = "1995-09-01",
                      month_end: str = "1995-10-01") -> DataFrame:
    """TPC-H Q14 shape: promo-revenue share — a conditional-sum ratio over
    one broadcast join. The date filter prunes the fact scan before the
    join; part (the dim) broadcasts; both sums come out of one aggregate
    pass (no second scan for the denominator)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter((F.col("l_shipdate") >= F.lit(month_start))
                        & (F.col("l_shipdate") < F.lit(month_end)))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                              .otherwise(F.lit(0.0))) / F.sum(rev),
                4).alias("promo_revenue_pct"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
        )
    )


# Q19-style disjunctive predicate triples: (brand, max p_size, qty lo, qty hi)
Q19_PREDICATES = (
    ("Brand#1", 5, 1, 11),
    ("Brand#2", 10, 10, 20),
    ("Brand#3", 15, 20, 30),
)


def q19_disjunctive_revenue(lineitem: DataFrame,
                            part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of brand/size/quantity
    predicate triples (adapted to this schema's columns). The join is an
    equi-join on partkey with the OR-of-ANDs as a post-join filter —
    Catalyst pushes the single-table conjuncts (p_size >= 1, brand IN set)
    into the broadcast side's scan; the fact side never shuffles."""
    conds = None
    for brand, size_hi, qty_lo, qty_hi in Q19_PREDICATES:
        c = ((F.col("p_brand") == brand)
             & (F.col("p_size") >= 1) & (F.col("p_size") <= size_hi)
             & (F.col("l_quantity") >= qty_lo)
             & (F.col("l_quantity") <= qty_hi))
        conds = c if conds is None else (conds | c)
    return (
        lineitem
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(conds)
        .agg(
            F.round(F.sum(F.col("l_extendedprice")
                          * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )
